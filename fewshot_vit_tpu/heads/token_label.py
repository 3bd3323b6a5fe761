"""SUN token-label student/teacher head and its episodic-eval variant.

Re-design of ``sun_meta_training/models/token_label.py:36-104``:

  * ``TokenLabel``: encoder + global classifier (C classes) + local token
    classifier (C+1 classes, background included). ``is_teacher=True`` routes
    the dense map through the *global* classifier (the teacher labels patches
    with base classes only). Token logits stay NHWC (B, H, W, C') — the
    reference permutes back to NCHW, which is pure layout noise on TPU.
  * ``TokenLabelEpisodic``: eval head combining dense top-1 local cosine
    similarity with global cosine prototype logits (temp 10).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from ..ops.metric import compute_logits, l2_normalize
from .classifier import LinearClassifier


class TokenLabel(nn.Module):
    encoder: nn.Module
    n_classes: int
    dtype: Any = jnp.float32

    # Whole-classification signature (x, train, is_teacher), not the episodic
    # (x_shot, x_query) -> (E, Q, way) contract (see train/meta_tune.py).
    standard_episodic = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, is_teacher: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        dense, pooled = self.encoder(x, train)
        classifier = LinearClassifier(self.n_classes, dtype=self.dtype, name="classifier")
        classifier_local = LinearClassifier(
            self.n_classes + 1, dtype=self.dtype, name="classifier_local"
        )
        y_token = classifier(dense) if is_teacher else classifier_local(dense)
        y = classifier(pooled)
        return y_token, y, pooled


class TokenLabelEpisodic(nn.Module):
    """Episodic eval for SUN checkpoints (reference ``token_label.py:62-104``).

    Returns (local_logits, cls_logits): local = mean-over-shots of per-class
    top-1 patch cosine similarity; cls = cosine prototype logits at temp 10.
    """

    encoder: nn.Module
    temp: float = 10.0

    # Tuple return (local, cls logits): an eval-/research-only head, not the
    # single-logits episodic contract (see train/meta_tune.py).
    standard_episodic = False

    @nn.compact
    def __call__(
        self, x_shot: jax.Array, x_query: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        e, way, shot = x_shot.shape[:3]
        q = x_query.shape[1]
        img = x_shot.shape[3:]

        x_all = jnp.concatenate(
            [x_shot.reshape((-1,) + img), x_query.reshape((-1,) + img)], axis=0
        )
        dense, pooled = self.encoder(x_all, train)
        c = dense.shape[-1]
        t = dense.shape[1] * dense.shape[2]
        n_shot = e * way * shot

        feat_shot = dense[:n_shot].reshape(e, way, shot * t, c)
        feat_query = dense[n_shot:].reshape(e, q, t, c)
        fs = l2_normalize(feat_shot.astype(jnp.float32))
        fq = l2_normalize(feat_query.astype(jnp.float32))
        # Per query patch: best cosine match over ALL support patches of a
        # class; average over query patches -> (E, Q, way). This is the
        # *documented intent* of the reference head — its code is broken dead
        # research code: ``sun_meta_training/token_label.py:89`` reshapes
        # feat_query as the support, the local branch (:89-95) only typechecks
        # for a 5-dim flat query while the cls reshape (:103) assumes a 6-dim
        # (b, way, q_per) query, so NO input rank lets the reference forward
        # complete (verified by execution in tests/test_heads_eval.py). We
        # implement the intended local top-1 matching directly; the cls branch
        # is parity-anchored line-by-line against the reference's cls-path
        # code at the rank it assumes.
        # Lineage note: the reference has TWO divergent copies of this head.
        # This port follows the ``sun_meta_training`` copy's documented intent
        # (all-pairs matching). The ``meta_tuning_sun_m`` copy (:70-112) is a
        # different evolution — positionally-aligned per-shot similarity —
        # and THAT lineage is ported faithfully (execution-anchored) in
        # ``TokenLabelEpisodicReweight``/``TokenLabelEpisodicChannelAttn``
        # below, which extend it.
        sim = jnp.einsum("eqtc,enkc->eqntk", fq, fs)  # (E, Q, way, T, shot*T)
        local = jnp.mean(jnp.max(sim, axis=-1), axis=-1)  # (E, Q, way)

        pooled_shot = pooled[:n_shot].reshape(e, way, shot, -1).mean(axis=2)
        pooled_query = pooled[n_shot:].reshape(e, q, -1)
        cls_logits = compute_logits(
            pooled_query.astype(jnp.float32),
            pooled_shot.astype(jnp.float32),
            "cos",
            self.temp,
        )
        return local, cls_logits


def _cosine(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """``torch.cosine_similarity(dim=-1)`` semantics with broadcasting:
    sum(a*b) / max(||a||*||b||, eps)."""
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


def _encode_episode(encoder, x_shot, x_query, train):
    """One encoder pass over shot+query; returns fp32 token/pooled features
    ``fs (E,way,shot,T,C), fq (E,Q,T,C), ps (E,way,shot,C'), pq (E,Q,C')``.
    Token order is row-major over (H, W) — identical to the reference's
    ``.view(c, h*w).transpose(-1, -2)`` flattening of an NCHW map."""
    e, way, shot = x_shot.shape[:3]
    q = x_query.shape[1]
    img = x_shot.shape[3:]
    x_all = jnp.concatenate(
        [x_shot.reshape((-1,) + img), x_query.reshape((-1,) + img)], axis=0
    )
    dense, pooled = encoder(x_all, train)
    c = dense.shape[-1]
    t = dense.shape[1] * dense.shape[2]
    n_shot = e * way * shot
    fs = dense[:n_shot].reshape(e, way, shot, t, c).astype(jnp.float32)
    fq = dense[n_shot:].reshape(e, q, t, c).astype(jnp.float32)
    ps = pooled[:n_shot].reshape(e, way, shot, -1).astype(jnp.float32)
    pq = pooled[n_shot:].reshape(e, q, -1).astype(jnp.float32)
    return fs, fq, ps, pq


def _aligned_local_logits(fq: jax.Array, fs: jax.Array) -> jax.Array:
    """Position-aligned local matching: per (query, class, shot), cosine of
    query token i vs support token i, best token position, mean over shots.

    fq (E,Q,n|1,T,C) vs fs (E,way,shot,T,C) -> (E,Q,way). This is the evident
    intent of the ``meta_tuning_sun_m/models/token_label.py`` episodic heads:
    their own shape comments pin ``feat_sim_`` as (b,q,n,k) and ``logits`` as
    (b,q,n) (``:239-240``), which only the per-shot aligned topk/mean produces;
    the code as written flattens shots into ``k*t`` (1-shot-only) and applies
    one ``.mean`` too many, collapsing the class axis (parity-tested against
    execution in tests/test_token_label_variants.py)."""
    sim = _cosine(fq[:, :, :, None], fs[:, None])  # (E,Q,way,shot,T)
    return jnp.max(sim, axis=-1).mean(axis=-1)


def _cls_logits(ps: jax.Array, pq: jax.Array, temp: float) -> jax.Array:
    """The shared global branch (``token_label.py:247-253``): cosine of pooled
    query vs shot-mean prototype at ``temp``."""
    proto = l2_normalize(ps.mean(axis=2))
    return compute_logits(l2_normalize(pq), proto, "dot", temp)


class _BottleneckMLP(nn.Module):
    """``nn.Linear(dim, dim*ratio) -> ReLU -> nn.Linear(dim*ratio, dim)``
    (the ``intra_task/class_learner`` shape, ``token_label.py:174-182``)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        return nn.Dense(self.out, name="fc2")(x)


class TokenLabelEpisodicReweight(nn.Module):
    """``token-label-ep-rw`` (``meta_tuning_sun_m/models/token_label.py:
    164-257``): episodic local matching with learned task/class reweighting.

    The reference class is dead research code — its ctor reads module globals
    ``dim``/``ratio`` that are never defined (NameError on construction), and
    its forward only typechecks for 1-shot. The evident intent is recoverable:
    ``dim`` is the encoder width, ``ratio=4`` matches the in-file
    ``MetaLearner`` (``:219-230``) that builds the SAME two learner MLPs, and
    the shape comments pin the reductions (see ``_aligned_local_logits``).
    With those two globals injected the reference RUNS at 1-shot, and this
    port is numerically parity-tested against it
    (tests/test_token_label_variants.py). Two knowing deviations, both at
    bug sites: ``logits_reweight`` here really uses the reweighted features
    (the reference computes reweighted similarities and then reuses the
    unreweighted ones — executed proof: its ``logits_reweight == logits``
    exactly), and the class axis is kept (reference's extra ``.mean`` yields
    unusable (B, Q) logits). The ctor's unused ``classifier`` heads are
    omitted (never touched by forward).

    Returns ``(logits, logits_reweight, cls_logits, cls_logits_reweight)``:
    (E,Q,way) each.
    """

    encoder: nn.Module
    ratio: int = 4
    temp: float = 10.0

    # 4-tuple return: eval-/research-only (see train/meta_tune.py's check).
    standard_episodic = False

    @nn.compact
    def __call__(
        self, x_shot: jax.Array, x_query: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        fs, fq, ps, pq = _encode_episode(self.encoder, x_shot, x_query, train)
        c = fs.shape[-1]

        task_mlp = _BottleneckMLP(c * self.ratio, c, name="intra_task_learner")
        class_mlp = _BottleneckMLP(c * self.ratio, c, name="intra_class_learner")
        # task kernel: mean over all support tokens (``:210``); class weights:
        # per-class channel sigmoid gate (``:211-214``).
        w_task = task_mlp(fs.mean(axis=(1, 2, 3)))  # (E, C)
        w_class = jax.nn.sigmoid(class_mlp(fs.mean(axis=(2, 3))))  # (E,way,C)

        # channel reweight (``:221-222``), then the spatial saliency map from
        # the task kernel (``:224-230``): sigmoid(feat . w_task) per token.
        fq_rw = fq[:, :, None] * w_class[:, None, :, None]  # (E,Q,way,T,C)
        fs_rw = fs * w_class[:, :, None, None]  # (E,way,shot,T,C)
        map_q = jax.nn.sigmoid(jnp.einsum("eqntc,ec->eqnt", fq_rw, w_task))
        map_s = jax.nn.sigmoid(jnp.einsum("enktc,ec->enkt", fs_rw, w_task))
        fq_rw = fq_rw * map_q[..., None]
        fs_rw = fs_rw * map_s[..., None]

        logits = _aligned_local_logits(fq[:, :, None], fs)
        logits_rw = _aligned_local_logits(fq_rw, fs_rw)

        cls_logits = _cls_logits(ps, pq, self.temp)
        # ``:245-247``: einsum of l2-normalized token-mean reweighted feats,
        # no temperature. (The reference's shot mean is over the flattened
        # (shot*T) axis — equal weights, identical to mean over both axes.)
        x_s = l2_normalize(fs_rw.mean(axis=(2, 3)))  # (E,way,C)
        x_q = l2_normalize(fq_rw.mean(axis=3))  # (E,Q,way,C)
        cls_logits_rw = jnp.einsum("eqnc,enc->eqn", x_q, x_s)
        return logits, logits_rw, cls_logits, cls_logits_rw


class TokenLabelEpisodicChannelAttn(nn.Module):
    """``token-label-ep-cr`` (``meta_tuning_sun_m/models/token_label.py:
    262-314``): episodic local matching where each query's channels are mixed
    by a (C, C) attention computed against each class's support tokens.

    The reference forward RUNS at 1-shot (its ``expand(-1,-1,-1,k*t,-1)`` at
    ``:290`` only typechecks for k=1) and this port is parity-tested against
    that execution; for k>1 the query tokens are tiled across shots (the
    expand's evident intent) and the final reductions keep the class axis
    (see ``_aligned_local_logits``). The ctor's unused classifier heads are
    omitted.

    Returns ``(logits, cls_logits)``: (E,Q,way) each.
    """

    encoder: nn.Module
    temp: float = 10.0

    # Tuple return: eval-/research-only (see train/meta_tune.py's check).
    standard_episodic = False

    @nn.compact
    def __call__(
        self, x_shot: jax.Array, x_query: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        fs, fq, ps, pq = _encode_episode(self.encoder, x_shot, x_query, train)
        e, way, shot, t, c = fs.shape
        # (query tokens tiled over shots)^T @ support tokens, scaled by
        # sqrt(shot*T), softmax over the second channel axis (``:292-294``).
        # The reference materializes the expand/tile of the query tokens to
        # (.., way, shot*T, C); tiled index x=s*T+i is fq[i] against
        # fs[s, i], so the contraction collapses to one einsum summing over
        # (shot, token) — identical values, no (E,Q,way,shot*T,C) tensor.
        attn = jnp.einsum("eqic,ensid->eqncd", fq, fs)
        attn = jax.nn.softmax(attn / float(shot * t) ** 0.5, axis=-1)
        # feat_query @ attn^T (``:295``)
        fq_attn = jnp.einsum("eqtj,eqnij->eqnti", fq, attn)
        logits = _aligned_local_logits(fq_attn, fs)
        return logits, _cls_logits(ps, pq, self.temp)


class TokenLabelV2(nn.Module):
    """``token-label-v2`` (``meta_tuning_sun_m/models/token_label.py:317-343``):
    the SUN student with a 3-layer projection MLP on the dense map and a
    3-layer local head projecting to a ``dim``-d token embedding (instead of
    C+1 token classes).

    The reference ctor passes a *list* to ``nn.Sequential`` (TypeError on
    construction) — with that one evident fix applied (varargs) it runs
    verbatim, and this port is parity-tested against it. Token outputs stay
    NHWC (the reference permutes to NCHW — pure layout noise on TPU).

    Returns ``(y_token (B,H,W,dim), y (B,n_classes), pooled_scaled (B,C),
    y_projection (B,H,W,C))``.
    """

    encoder: nn.Module
    n_classes: int
    dim: int = 128
    dtype: Any = jnp.float32

    # Whole-classification signature: not episodic (see train/meta_tune.py).
    standard_episodic = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        dense, pooled = self.encoder(x, train)
        c = dense.shape[-1]
        scale = 1.0 / float(c) ** 0.5
        dense = dense * scale
        pooled = pooled * scale

        def mlp3(x, widths, name):
            for i, w in enumerate(widths):
                x = nn.Dense(w, dtype=self.dtype, name=f"{name}_{2 * i}")(x)
                if i < len(widths) - 1:
                    x = nn.relu(x)
            return x

        y_proj = mlp3(dense, (c, c, c), "projection")
        y_token = mlp3(y_proj, (c, c, self.dim), "classifier_local")
        y = LinearClassifier(self.n_classes, dtype=self.dtype,
                             name="classifier")(pooled)
        return y_token, y, pooled, y_proj


@models.register("token-label")
def make_token_label(
    encoder: str,
    encoder_args: Optional[dict] = None,
    classifier: str = "linear-classifier",
    classifier_args: Optional[dict] = None,
    dtype: Any = jnp.float32,
) -> TokenLabel:
    if classifier != "linear-classifier":
        raise ValueError("token-label head supports linear-classifier only")
    n_classes = int((classifier_args or {})["n_classes"])
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    return TokenLabel(encoder=enc, n_classes=n_classes, dtype=dtype)


@models.register("token-label-ep")
def make_token_label_ep(
    encoder: str,
    encoder_args: Optional[dict] = None,
    temp: float = 10.0,
    dtype: Any = jnp.float32,
    **_: Any,
) -> TokenLabelEpisodic:
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    return TokenLabelEpisodic(encoder=enc, temp=temp)


@models.register("token-label-ep-rw")
def make_token_label_ep_rw(
    encoder: str,
    encoder_args: Optional[dict] = None,
    ratio: int = 4,
    temp: float = 10.0,
    dtype: Any = jnp.float32,
    **_: Any,
) -> TokenLabelEpisodicReweight:
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    return TokenLabelEpisodicReweight(encoder=enc, ratio=ratio, temp=temp)


@models.register("token-label-ep-cr")
def make_token_label_ep_cr(
    encoder: str,
    encoder_args: Optional[dict] = None,
    temp: float = 10.0,
    dtype: Any = jnp.float32,
    **_: Any,
) -> TokenLabelEpisodicChannelAttn:
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    return TokenLabelEpisodicChannelAttn(encoder=enc, temp=temp)


@models.register("token-label-v2")
def make_token_label_v2(
    encoder: str,
    encoder_args: Optional[dict] = None,
    classifier: str = "linear-classifier",
    classifier_args: Optional[dict] = None,
    dim: int = 128,
    dtype: Any = jnp.float32,
    **_: Any,
) -> TokenLabelV2:
    if classifier != "linear-classifier":
        raise ValueError("token-label-v2 head supports linear-classifier only")
    n_classes = int((classifier_args or {})["n_classes"])
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    return TokenLabelV2(encoder=enc, n_classes=n_classes, dim=dim, dtype=dtype)
