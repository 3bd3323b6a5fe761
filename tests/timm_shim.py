"""Minimal timm stand-in so the reference's timm-dependent model files can be
imported for parity testing (timm is not installed in this image).

Provides only the symbols the reference backbones actually use, implemented to
match timm semantics: DropPath, Mlp, PatchEmbed, trunc_normal_, to_2tuple /
to_ntuple, create_conv2d / create_pool2d (padding='same' max pool), plus no-op
registry/helper stubs. Installed into ``sys.modules`` as ``timm.*`` by
``install()`` — call before ``ref_loader.load_ref_model_module``.
"""

import collections.abc
import math
import sys
import types
from itertools import repeat

import torch
import torch.nn as nn
import torch.nn.functional as F


def _ntuple(n):
    def parse(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(repeat(x, n))
    return parse


to_1tuple, to_2tuple, to_3tuple, to_4tuple = (_ntuple(i) for i in range(1, 5))
to_ntuple = _ntuple


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    with torch.no_grad():
        l = (1.0 + math.erf((a - mean) / std / math.sqrt(2.0))) / 2.0
        u = (1.0 + math.erf((b - mean) / std / math.sqrt(2.0))) / 2.0
        tensor.uniform_(2 * l - 1, 2 * u - 1)
        tensor.erfinv_()
        tensor.mul_(std * math.sqrt(2.0)).add_(mean)
        tensor.clamp_(min=a, max=b)
    return tensor


def drop_path(x, drop_prob=0.0, training=False):
    if drop_prob == 0.0 or not training:
        return x
    keep = 1 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
    mask.floor_()
    return x.div(keep) * mask


class DropPath(nn.Module):
    def __init__(self, drop_prob=None):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        return drop_path(x, self.drop_prob or 0.0, self.training)


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop = nn.Dropout(drop)

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class PatchEmbed(nn.Module):
    """timm PatchEmbed: conv stride=patch, flatten to (B, N, C), optional norm."""

    def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768,
                 norm_layer=None, flatten=True):
        super().__init__()
        img_size = to_2tuple(img_size)
        patch_size = to_2tuple(patch_size)
        self.img_size = img_size
        self.patch_size = patch_size
        self.grid_size = (img_size[0] // patch_size[0], img_size[1] // patch_size[1])
        self.num_patches = self.grid_size[0] * self.grid_size[1]
        self.flatten = flatten
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size, stride=patch_size)
        self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

    def forward(self, x):
        x = self.proj(x)
        if self.flatten:
            x = x.flatten(2).transpose(1, 2)
        return self.norm(x)


def create_conv2d(in_chs, out_chs, kernel_size, **kwargs):
    """timm create_conv2d subset: explicit or 'same'-style int padding."""
    padding = kwargs.pop("padding", "")
    stride = kwargs.pop("stride", 1)
    dilation = kwargs.pop("dilation", 1)
    bias = kwargs.pop("bias", True)
    groups = kwargs.pop("groups", 1)
    if padding == "" or padding == "same":
        padding = ((stride - 1) + dilation * (kernel_size - 1)) // 2
    return nn.Conv2d(in_chs, out_chs, kernel_size, stride=stride, padding=padding,
                     dilation=dilation, groups=groups, bias=bias)


class _MaxPool2dSame(nn.Module):
    def __init__(self, kernel_size, stride):
        super().__init__()
        self.k = to_2tuple(kernel_size)
        self.s = to_2tuple(stride)

    def forward(self, x):
        ih, iw = x.shape[-2:]
        pad_h = max((math.ceil(ih / self.s[0]) - 1) * self.s[0] + self.k[0] - ih, 0)
        pad_w = max((math.ceil(iw / self.s[1]) - 1) * self.s[1] + self.k[1] - iw, 0)
        x = F.pad(x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2],
                  value=-float("inf"))
        return F.max_pool2d(x, self.k, self.s)


def create_pool2d(pool_type, kernel_size, stride=None, **kwargs):
    assert pool_type == "max"
    padding = kwargs.pop("padding", "")
    stride = stride or kernel_size
    if padding == "same":
        return _MaxPool2dSame(kernel_size, stride)
    if padding == "":
        # timm pad_type '': symmetric pytorch padding
        padding = ((stride - 1) + 1 * (kernel_size - 1)) // 2
    return nn.MaxPool2d(kernel_size, stride=stride, padding=padding)


def create_classifier(num_features, num_classes, pool_type="avg"):
    pool = nn.AdaptiveAvgPool2d(1)
    fc = nn.Linear(num_features, num_classes) if num_classes > 0 else nn.Identity()
    return pool, fc


def get_act_layer(name="relu"):
    return {"relu": nn.ReLU, "gelu": nn.GELU, "hard_swish": nn.Hardswish,
            "silu": nn.SiLU}[name if isinstance(name, str) else "relu"]


def named_apply(fn, module, name="", depth_first=True, include_root=False):
    if not depth_first and include_root:
        fn(module=module, name=name)
    for child_name, child_module in module.named_children():
        child_name = ".".join((name, child_name)) if name else child_name
        named_apply(fn, child_module, child_name, depth_first, True)
    if depth_first and include_root:
        fn(module=module, name=name)
    return module


def _noop(*a, **k):
    raise NotImplementedError("timm shim: pretrained-model helpers unavailable")


def register_model(fn):
    return fn


def _cfg(url="", **kwargs):
    return dict(url=url, **kwargs)


def _init_vit_weights(module, name="", head_bias=0.0, jax_impl=False):
    if isinstance(module, nn.Linear):
        trunc_normal_(module.weight, std=0.02)
        if module.bias is not None:
            nn.init.zeros_(module.bias)
    elif isinstance(module, nn.LayerNorm):
        nn.init.zeros_(module.bias)
        nn.init.ones_(module.weight)


# --- timm.scheduler (faithful to timm's scheduler/{scheduler,cosine_lr,
# multistep_lr}.py semantics for the construction + step(epoch) path the
# reference drives: t_in_epochs=True, no noise, cycle_limit=1) -----------------


class _Scheduler:
    """timm Scheduler base: snapshots each param group's construction-time lr
    as ``base_values`` and rewrites group lrs on ``step``."""

    def __init__(self, optimizer, param_group_field="lr"):
        self.optimizer = optimizer
        self.param_group_field = param_group_field
        self._initial_param_group_field = f"initial_{param_group_field}"
        for group in optimizer.param_groups:
            group.setdefault(self._initial_param_group_field, group[param_group_field])
        self.base_values = [
            g[self._initial_param_group_field] for g in optimizer.param_groups
        ]

    def update_groups(self, values):
        if not isinstance(values, (list, tuple)):
            values = [values] * len(self.optimizer.param_groups)
        for group, value in zip(self.optimizer.param_groups, values):
            group[self.param_group_field] = value

    def step(self, epoch, metric=None):
        values = self.get_epoch_values(epoch)
        if values is not None:
            self.update_groups(values)


class CosineLRScheduler(_Scheduler):
    """timm cosine_lr.CosineLRScheduler (warmup_prefix=False, k_decay=1)."""

    def __init__(self, optimizer, t_initial, lr_min=0.0, cycle_mul=1.0,
                 cycle_decay=1.0, cycle_limit=1, warmup_t=0, warmup_lr_init=0,
                 warmup_prefix=False, t_in_epochs=True, **kwargs):
        super().__init__(optimizer)
        assert cycle_mul == 1.0 and not warmup_prefix, "shim: reference usage only"
        self.t_initial = t_initial
        self.lr_min = lr_min
        self.cycle_decay = cycle_decay
        self.cycle_limit = cycle_limit
        self.warmup_t = warmup_t
        self.warmup_lr_init = warmup_lr_init
        self.t_in_epochs = t_in_epochs
        if self.warmup_t:
            self.warmup_steps = [
                (v - warmup_lr_init) / self.warmup_t for v in self.base_values
            ]
            super().update_groups(self.warmup_lr_init)
        else:
            self.warmup_steps = [1 for _ in self.base_values]

    def _get_lr(self, t):
        if t < self.warmup_t:
            return [self.warmup_lr_init + t * s for s in self.warmup_steps]
        i = t // self.t_initial
        t_curr = t - i * self.t_initial
        gamma = self.cycle_decay ** i
        if i < self.cycle_limit:
            return [
                self.lr_min
                + 0.5 * (v * gamma - self.lr_min)
                * (1 + math.cos(math.pi * t_curr / self.t_initial))
                for v in self.base_values
            ]
        return [self.lr_min for _ in self.base_values]

    def get_epoch_values(self, epoch):
        return self._get_lr(epoch) if self.t_in_epochs else None


class MultiStepLRScheduler(_Scheduler):
    """timm multistep_lr.MultiStepLRScheduler."""

    def __init__(self, optimizer, decay_t, decay_rate=1.0, warmup_t=0,
                 warmup_lr_init=0, t_in_epochs=True, **kwargs):
        super().__init__(optimizer)
        self.decay_t = sorted(decay_t)
        self.decay_rate = decay_rate
        self.warmup_t = warmup_t
        self.warmup_lr_init = warmup_lr_init
        self.t_in_epochs = t_in_epochs
        if self.warmup_t:
            self.warmup_steps = [
                (v - warmup_lr_init) / self.warmup_t for v in self.base_values
            ]
            super().update_groups(self.warmup_lr_init)
        else:
            self.warmup_steps = [1 for _ in self.base_values]

    def get_curr_decay_steps(self, t):
        import bisect

        return bisect.bisect_right(self.decay_t, t + 1)

    def _get_lr(self, t):
        if t < self.warmup_t:
            return [self.warmup_lr_init + t * s for s in self.warmup_steps]
        return [
            v * (self.decay_rate ** self.get_curr_decay_steps(t))
            for v in self.base_values
        ]

    def get_epoch_values(self, epoch):
        return self._get_lr(epoch) if self.t_in_epochs else None


def install():
    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    def create_transform(*a, **k):  # dataset modules import it at module
        raise NotImplementedError(   # scope; trajectory tests feed tensors
            "timm_shim.create_transform is import-only")

    data.create_transform = create_transform
    data_transforms = types.ModuleType("timm.data.transforms")

    class RandomResizedCropAndInterpolation:  # import-only (see above)
        def __init__(self, *a, **k):
            raise NotImplementedError("timm_shim transform is import-only")

    data_transforms.RandomResizedCropAndInterpolation = RandomResizedCropAndInterpolation
    data.transforms = data_transforms
    auto_augment = types.ModuleType("timm.data.auto_augment")

    def rand_augment_transform(*a, **k):  # import-only
        raise NotImplementedError("timm_shim transform is import-only")

    auto_augment.rand_augment_transform = rand_augment_transform
    data.auto_augment = auto_augment
    random_erasing = types.ModuleType("timm.data.random_erasing")
    random_erasing.RandomErasing = RandomResizedCropAndInterpolation  # import-only
    data.random_erasing = random_erasing
    models_m = types.ModuleType("timm.models")
    def build_model_with_cfg(model_cls, variant, pretrained, **kwargs):
        assert not pretrained, "timm shim: no pretrained weights"
        kwargs.pop("default_cfg", None)
        kwargs.pop("feature_cfg", None)
        kwargs.pop("pretrained_filter_fn", None)
        return model_cls(**kwargs)

    helpers = types.ModuleType("timm.models.helpers")
    helpers.build_model_with_cfg = build_model_with_cfg
    helpers.overlay_external_default_cfg = lambda *a, **k: None
    helpers.named_apply = named_apply
    helpers.load_pretrained = _noop
    layers = types.ModuleType("timm.models.layers")
    for sym in ("DropPath", "Mlp", "PatchEmbed", "trunc_normal_", "to_2tuple",
                "to_ntuple", "create_conv2d", "create_pool2d",
                "create_classifier", "get_act_layer"):
        setattr(layers, sym, globals()[sym])
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = register_model
    vit = types.ModuleType("timm.models.vision_transformer")
    vit._cfg = _cfg
    vit.checkpoint_filter_fn = lambda sd, model: sd
    vit._init_vit_weights = _init_vit_weights
    resnet_m = types.ModuleType("timm.models.resnet")
    resnet_m.resnet26d = resnet_m.resnet50d = resnet_m.resnet101d = _noop
    scheduler = types.ModuleType("timm.scheduler")
    scheduler.CosineLRScheduler = CosineLRScheduler
    scheduler.MultiStepLRScheduler = MultiStepLRScheduler
    optim = types.ModuleType("timm.optim")
    # timm.optim.AdamW is a verbatim copy of torch's decoupled AdamW
    # (timm optim/adamw.py header cites the torch implementation)
    optim.AdamW = torch.optim.AdamW

    for name, mod in [
        ("timm", timm), ("timm.data", data),
        ("timm.data.transforms", data_transforms),
        ("timm.data.auto_augment", auto_augment),
        ("timm.data.random_erasing", random_erasing), ("timm.models", models_m),
        ("timm.models.helpers", helpers), ("timm.models.layers", layers),
        ("timm.models.registry", registry),
        ("timm.models.vision_transformer", vit), ("timm.models.resnet", resnet_m),
        ("timm.scheduler", scheduler), ("timm.optim", optim),
    ]:
        sys.modules.setdefault(name, mod)
    timm.data = data
    timm.models = models_m
    timm.scheduler = scheduler
    timm.optim = optim
    models_m.helpers = helpers
    models_m.layers = layers
    models_m.registry = registry
    models_m.vision_transformer = vit
    models_m.resnet = resnet_m
