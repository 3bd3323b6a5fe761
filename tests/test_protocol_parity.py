"""End-to-end protocol parity: reference eval stack (torch CPU) vs this
framework, as ONE chain — .pth loader -> layout converter -> identical episode
indices -> per-episode accuracy -> CI stats.

The torch side is the REAL reference code (``test_phase/test_few_shot.py:36-117``
driven through its own ``models``/``utils``/``CategoriesSampler`` packages),
not a reimplementation; the JAX side is the public eval path
(``eval.run.load_model_for_eval`` + ``eval.episodic.evaluate``). Both consume
the same synthetic dataset and the same episode index stream, so any
divergence anywhere in loader/converter/episode-split/logits/acc/CI fails
here — the strongest parity statement available without the released
checkpoints/pickles (VERDICT r1, next-round item 2).
"""

import numpy as np
import pytest

from . import ref_loader

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not ref_loader.available(), reason="reference/torch not available"),
]

WAY, SHOT, QUERY = 5, 1, 15
N_EPISODES = 16
EP_PER_BATCH = 8  # JAX side batches episodes; torch protocol is 1/batch


def synthetic_dataset(n_classes=10, n_per_class=20, img=80, seed=3):
    """Clustered uint8 images: separable enough to beat chance, noisy enough
    that episode accuracy is non-degenerate (not pinned at 1.0)."""
    rng = np.random.default_rng(seed)
    protos = rng.integers(90, 166, (n_classes, 1, 1, 3)).astype(np.float32)
    labels = np.repeat(np.arange(n_classes), n_per_class)
    noise = rng.normal(0.0, 90.0, (n_classes * n_per_class, img, img, 3))
    images = np.clip(protos[labels] + noise, 0, 255).astype(np.uint8)
    return images, labels


class TestEvalProtocolChain:
    def test_torch_vs_jax_end_to_end(self, tmp_path):
        import torch

        tp = ref_loader.load_test_phase()
        images, labels = synthetic_dataset()
        mean = np.array([0.471, 0.450, 0.403], np.float32)
        std = np.array([0.278, 0.268, 0.284], np.float32)

        # --- reference side: test_few_shot.py protocol, verbatim semantics ---
        torch.manual_seed(0)
        net = tp.models.make("meta-baseline", encoder="visformer_micro_80")
        net.eval()
        np.random.seed(12345)  # test_few_shot.py:38 fix_random_seeds
        sampler = tp.samplers.CategoriesSampler(
            labels, N_EPISODES, WAY, SHOT + QUERY, ep_per_batch=1
        )
        idx_batches = [b.numpy() for b in sampler]

        x_all = torch.from_numpy(images.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
        x_all = (x_all - torch.from_numpy(mean).view(1, 3, 1, 1)) / torch.from_numpy(
            std
        ).view(1, 3, 1, 1)
        label_q = tp.few_shot.make_nk_label(WAY, QUERY, ep_per_batch=1)
        va_ref = []
        with torch.no_grad():
            for idx in idx_batches:
                x_shot, x_query = tp.few_shot.split_shot_query(
                    x_all[idx], WAY, SHOT, QUERY, ep_per_batch=1
                )
                logits = net(x_shot, x_query).view(-1, WAY)
                va_ref.append(tp.utils.compute_acc(logits, label_q))
        va_ref = np.array(va_ref)
        # test_few_shot.py:20-25 CI
        import scipy.stats

        se = scipy.stats.sem(va_ref)
        ci_ref = se * scipy.stats.t.ppf((1 + 0.95) / 2.0, len(va_ref) - 1)

        # sanity: the protocol is non-degenerate on this dataset
        assert 0.3 < va_ref.mean() < 0.999, va_ref.mean()

        # --- framework side: .pth -> converter -> evaluate, same episodes ---
        blob = {
            "model": "meta-baseline",
            "model_args": {"encoder": "visformer_micro_80"},
            "model_sd": net.state_dict(),
        }
        pth = str(tmp_path / "max-va.pth")
        torch.save(blob, pth)

        from fewshot_vit_tpu.core import Config
        from fewshot_vit_tpu.data.datasets import ArrayDataset
        from fewshot_vit_tpu.eval.episodic import evaluate
        from fewshot_vit_tpu.eval.run import load_model_for_eval

        head, variables = load_model_for_eval(
            Config({"load": pth, "encoder": "visformer_micro_80"})
        )
        ds = ArrayDataset(
            images=images, labels=labels.astype(np.int32),
            n_classes=int(labels.max()) + 1, mean=mean, std=std,
        )
        idx_all = np.stack(idx_batches).reshape(
            N_EPISODES // EP_PER_BATCH, EP_PER_BATCH * WAY * (SHOT + QUERY)
        )
        acc, ci, accs = evaluate(
            head, variables, ds, n_episodes=N_EPISODES,
            shot=SHOT, query=QUERY, ep_per_batch=EP_PER_BATCH, indices=idx_all,
        )

        # per-episode agreement through the whole chain
        np.testing.assert_allclose(accs, va_ref, atol=1e-6)
        assert acc == pytest.approx(va_ref.mean(), abs=1e-6)
        assert ci == pytest.approx(ci_ref, rel=1e-4)
