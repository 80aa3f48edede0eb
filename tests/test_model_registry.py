"""create_model trainer registry (reference models/__init__ surface)."""

import pytest

from textualdegremoval_tpu.train.model_registry import create_model


def test_known_model_types_resolve():
    run = create_model({"model_type": "RefGuidedImageCleanModel"})
    assert callable(run)
    # DiffIR resolves to a runner driving the train_diffir CLI (both
    # registry entries share the run(max_iters=...) contract)
    run_diffir = create_model({"model_type": "DiffIRRefGuidedImageCleanModel"})
    assert callable(run_diffir)


def test_unknown_model_type_raises():
    with pytest.raises(KeyError):
        create_model({"model_type": "NopeModel"})
