"""Trainer ("model wrapper") registry — reference models/__init__.py:22-43
surface: `create_model(opt)` resolves opt['model_type'] to the training
flow."""

from __future__ import annotations

_MODEL_TYPES = {}


def register_model(name):
    def deco(fn):
        _MODEL_TYPES[name] = fn
        return fn
    return deco


def create_model(opt: dict):
    """Returns a callable running the training flow for this model type."""
    name = opt["model_type"]
    if name not in _MODEL_TYPES:
        raise KeyError(
            f"unknown model_type {name}; available: {sorted(_MODEL_TYPES)}")
    return _MODEL_TYPES[name](opt)


@register_model("RefGuidedImageCleanModel")
def _ref_guided(opt):
    from textualdegremoval_tpu.cli import train_restoration

    def run(max_iters=None):
        import tempfile, yaml, os

        with tempfile.NamedTemporaryFile(
                "w", suffix=".yml", delete=False) as f:
            yaml.safe_dump(opt, f)
            path = f.name
        try:
            args = ["--opt", path]
            if max_iters:
                args += ["--max_iters", str(max_iters)]
            return train_restoration.main(args)
        finally:
            os.unlink(path)

    return run


@register_model("DiffIRRefGuidedImageCleanModel")
def _diffir(opt):
    from textualdegremoval_tpu.cli import train_diffir

    def run(max_iters=None):
        import tempfile, yaml, os

        with tempfile.NamedTemporaryFile(
                "w", suffix=".yml", delete=False) as f:
            yaml.safe_dump(opt, f)
            path = f.name
        try:
            args = ["--opt", path]
            if max_iters:
                args += ["--max_iters", str(max_iters)]
            return train_diffir.main(args)
        finally:
            os.unlink(path)

    return run
