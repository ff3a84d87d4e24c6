"""Checkpoint parity: flax StofNet vs the reference PyTorch StofNet, using
the shipped trained weights (the only ground-truth artifacts in the repo)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.models.stofnet import StofNet
from stofnet_tpu.models.torch_import import import_stofnet

from tests import reference

# torch is required only by the parity tests; the pure-JAX smoke test
# below must stay alive in torch-free environments
torch = None
if reference.available():
    reference.add_to_path()
try:
    import torch
except ImportError:
    pass


@pytest.fixture(scope="module")
def armadillo():
    """(path, variables, overrides) — the .pth unpickle + conversion runs
    once per module, not once per consuming test."""
    if torch is None:
        pytest.skip("torch unavailable")
    path = reference.ckpt_path("different-armadillo")
    if path is None:
        pytest.skip("reference checkpoints unavailable")
    variables, overrides = import_stofnet(str(path))
    return str(path), variables, overrides


def _torch_stofnet(path, **kwargs):
    from models.stofnet import StofNet as TorchStofNet

    model = TorchStofNet(**kwargs)
    model.load_state_dict(torch.load(path, map_location="cpu", weights_only=True))
    model.eval()
    return model


def test_param_count_matches_reference(armadillo):
    _, variables, overrides = armadillo
    assert overrides == {"upsample_factor": 4}
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    assert n == 645_764  # BASELINE.md: full StofNet with SemiGlobalBlock


@pytest.mark.parametrize("length", [800, 4000])
def test_forward_parity_full(rng, armadillo, length):
    path, variables, overrides = armadillo
    model = StofNet(**overrides)

    x = rng.standard_normal((2, 1, length)).astype(np.float32)
    x /= np.abs(x).max()

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    tm = _torch_stofnet(path)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    assert ours.shape == ref.shape == (2, 1, length * 4)
    # 13 conv layers of f32 accumulate ~1e-4 relative differences
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4 * scale)


def test_forward_parity_ablation(rng):
    if torch is None:
        pytest.skip("torch unavailable")
    path = reference.ckpt_path("clean-serenity")
    if path is None:
        pytest.skip("reference checkpoints unavailable")
    variables, overrides = import_stofnet(str(path))
    assert overrides["semi_global_scale"] == 1
    model = StofNet(**overrides)

    x = rng.standard_normal((1, 1, 640)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    from models.stofnet import StofNet as TorchStofNet

    tm = TorchStofNet(semi_global_scale=1)
    tm.load_state_dict(torch.load(str(path), map_location="cpu", weights_only=True))
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4 * scale)


def test_random_init_runs(rng):
    """Un-imported model initializes and runs (training entry point)."""
    model = StofNet()
    x = jnp.zeros((1, 1, 800))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 1, 3200)
