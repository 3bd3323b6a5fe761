"""Load reference (torch) model files from /root/reference for parity testing.

The reference modules use package-relative imports (``from .models import
register``), so we synthesize a throwaway package per phase dir. This imports
the reference for *numerical cross-checking only* — the framework itself never
depends on it.
"""

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference"


def available() -> bool:
    if not os.path.isdir(REF_ROOT):
        return False
    try:
        import torch  # noqa: F401
        import einops  # noqa: F401
    except ImportError:
        return False
    return True


def install_qpth_shim() -> None:
    """The SUN-D files import qpth (absent); QPFunction is only needed for the
    qpth training solver, which parity tests don't exercise."""
    if "qpth" in sys.modules:
        return
    qpth = types.ModuleType("qpth")
    qp = types.ModuleType("qpth.qp")

    class QPFunction:  # pragma: no cover - never called in tests
        def __init__(self, *a, **k):
            raise NotImplementedError("qpth shim")

    qp.QPFunction = QPFunction
    qpth.qp = qp
    sys.modules["qpth"] = qpth
    sys.modules["qpth.qp"] = qp


def load_sun_d_module(modname: str):
    """Load a module from meta_tuning_sun_d/Models/models (no registry file)."""
    install_qpth_shim()
    pkg_dir = os.path.join(REF_ROOT, "meta_tuning_sun_d", "Models", "models")
    pkg_name = "refzoo_sun_d"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [pkg_dir]
        sys.modules[pkg_name] = pkg
    full = f"{pkg_name}.{modname}"
    if full not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            full, os.path.join(pkg_dir, f"{modname}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    return sys.modules[full]


def load_sun_d_file(relpath: str):
    """Load an arbitrary module file from ``meta_tuning_sun_d`` by relative
    path (e.g. ``Models/dataloader/samplers.py``, the grid dataloader).
    torchvision-dependent files need ``tests.torchvision_shim.install()``
    first."""
    install_qpth_shim()
    name = "refsund_" + relpath.replace("/", "_").removesuffix(".py")
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_ROOT, "meta_tuning_sun_d", relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_TEST_PHASE = None


def load_test_phase():
    """Import the reference eval stack (``test_phase``: models registry, utils,
    CategoriesSampler) as real torch packages for protocol-parity tests.

    The package uses absolute top-level imports (``import models`` /
    ``import utils``), so it must go on ``sys.path``; the timm-dependent
    backbones load through ``tests.timm_shim``.
    """
    global _TEST_PHASE
    if _TEST_PHASE is not None:
        return _TEST_PHASE
    from . import timm_shim

    timm_shim.install()
    tp = os.path.join(REF_ROOT, "test_phase")
    sys.path.insert(0, tp)
    try:
        import models  # noqa: F401 — reference registry package
        import utils  # noqa: F401
        from utils import few_shot
    finally:
        sys.path.remove(tp)
    spec = importlib.util.spec_from_file_location(
        "ref_tp_samplers", os.path.join(tp, "datasets", "samplers.py")
    )
    samplers = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(samplers)
    _TEST_PHASE = types.SimpleNamespace(
        models=models, utils=utils, few_shot=few_shot, samplers=samplers
    )
    return _TEST_PHASE


def load_ref_model_module(phase: str, modname: str):
    """e.g. load_ref_model_module('sun_meta_training', 'visformer')."""
    pkg_dir = os.path.join(REF_ROOT, phase, "models")
    pkg_name = f"refzoo_{phase}"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [pkg_dir]
        sys.modules[pkg_name] = pkg
    for sub in ("models", modname):
        full = f"{pkg_name}.{sub}"
        if full in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            full, os.path.join(pkg_dir, f"{sub}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    return sys.modules[f"{pkg_name}.{modname}"]


def load_phase_utils(phase: str):
    """Load ``<phase>/utils`` (compute_logits etc.) as a real package under a
    private name (it does ``from . import few_shot``)."""
    pkg_name = f"ref_utils_{phase}"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]
    pkg_dir = os.path.join(REF_ROOT, phase, "utils")
    spec = importlib.util.spec_from_file_location(
        pkg_name, os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[pkg_name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_phase_model_module(phase: str, modname: str):
    """Load ``<phase>/models/<modname>.py`` + that phase's registry, seeding
    the absolute ``import models`` / ``import utils`` names the file expects
    (and restoring them afterwards; the module's globals keep their own
    references). Returns (module, registry_module)."""
    from . import timm_shim

    timm_shim.install()
    pkg_name = f"refzoo_{phase}"
    full = f"{pkg_name}.{modname}"
    registry = load_ref_model_module(phase, "models")
    if full in sys.modules:
        return sys.modules[full], registry
    utils_mod = load_phase_utils(phase)
    saved = {k: sys.modules.get(k) for k in ("models", "utils")}
    sys.modules["models"] = registry
    sys.modules["utils"] = utils_mod
    try:
        spec = importlib.util.spec_from_file_location(
            full,
            os.path.join(REF_ROOT, phase, "models", f"{modname}.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod, registry


def load_sun_offline():
    """Load ``sun_meta_training/offline.py`` — the REAL phase-2 SUN loop
    module (``generate_softlabel``, ``SoftTargetCrossEntropy``) — seeding the
    absolute ``datasets``/``models``/``utils`` names it imports. Needs the
    timm + torchvision shims (installed here)."""
    name = "ref_smt_offline"
    if name in sys.modules:
        return sys.modules[name]
    from . import timm_shim, torchvision_shim

    timm_shim.install()
    torchvision_shim.install()
    ref = os.path.join(REF_ROOT, "sun_meta_training")
    registry = load_ref_model_module("sun_meta_training", "models")
    utils_mod = load_phase_utils("sun_meta_training")
    spec = importlib.util.spec_from_file_location(
        "ref_smt_datasets", os.path.join(ref, "datasets", "__init__.py"),
        submodule_search_locations=[os.path.join(ref, "datasets")],
    )
    ds_mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_smt_datasets"] = ds_mod
    saved = {k: sys.modules.get(k) for k in ("models", "utils", "datasets")}
    sys.modules["models"] = registry
    sys.modules["utils"] = utils_mod
    sys.modules["datasets"] = ds_mod
    try:
        spec.loader.exec_module(ds_mod)
        spec2 = importlib.util.spec_from_file_location(
            name, os.path.join(ref, "offline.py"))
        mod = importlib.util.module_from_spec(spec2)
        sys.modules[name] = mod
        spec2.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def load_sun_m_utils():
    """Back-compat alias: ``sun_meta_training/utils``."""
    mod = load_phase_utils("sun_meta_training")
    sys.modules.setdefault("ref_smt_utils", mod)
    return mod


def load_meta_token():
    """Load ``sun_meta_training/models/meta_token.py`` + its registry."""
    return load_phase_model_module("sun_meta_training", "meta_token")
