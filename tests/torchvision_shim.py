"""Minimal faithful torchvision.transforms shim (torchvision is not installed
on this box). Implements exactly the PIL-backed transforms the reference
dataloaders construct (``meta_tuning_sun_d/Models/dataloader/*``):
Compose / Resize / ToTensor / Normalize / RandomHorizontalFlip /
CenterCrop — each reproducing torchvision's PIL code path:

  * ``Resize([h, w])`` -> ``img.resize((w, h), Image.BILINEAR)`` (PIL's
    BILINEAR filter is convolution-based, i.e. antialiased on downscale,
    which is what torchvision's PIL backend does);
  * ``ToTensor`` -> uint8 HWC / 255 as float32 CHW;
  * ``Normalize(mean, std)`` -> (t - mean) / std per channel.

Install BEFORE importing any reference dataloader module.
"""

import sys
import types

import numpy as np


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class Resize:
    def __init__(self, size, interpolation=None):
        self.size = size  # int or [h, w]
        self.interpolation = interpolation

    def __call__(self, img):
        from PIL import Image

        if isinstance(self.size, int):
            w, h = img.size
            if w <= h:
                ow, oh = self.size, int(self.size * h / w)
            else:
                oh, ow = self.size, int(self.size * w / h)
        else:
            oh, ow = self.size
        return img.resize((ow, oh), Image.BILINEAR)


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        oh, ow = self.size
        w, h = img.size
        left = int(round((w - ow) / 2.0))
        top = int(round((h - oh) / 2.0))
        return img.crop((left, top, left + ow, top + oh))


class ToTensor:
    def __call__(self, img):
        import torch

        a = np.asarray(img, np.uint8).astype(np.float32) / 255.0
        if a.ndim == 2:
            a = a[:, :, None]
        return torch.from_numpy(a.transpose(2, 0, 1).copy())


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, t):
        import torch

        mean = torch.from_numpy(self.mean).view(-1, 1, 1)
        std = torch.from_numpy(self.std).view(-1, 1, 1)
        return (t - mean) / std


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        import torch
        from PIL import Image

        if float(torch.rand(1)) < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


def install():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    for cls in (Compose, Resize, CenterCrop, ToTensor, Normalize,
                RandomHorizontalFlip):
        setattr(transforms, cls.__name__, cls)
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
