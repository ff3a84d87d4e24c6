"""Checkpoint interop round trip: .pth -> flax variables -> .pth.

The exporter (models/torch_import.py:params_to_state_dict +
registry.export_checkpoint) must reproduce the reference's torch state
dicts bit-for-bit — names, layouts, and values — so weights trained here
load back into the reference pipeline (main.py:172-177).
"""

import numpy as np
import pytest

from stofnet_tpu.models.registry import export_checkpoint, import_checkpoint
from stofnet_tpu.models.torch_import import (
    import_stofnet, load_torch_state_dict,
)

from tests import reference

CASES = [  # (model name, shipped ckpt prefix)
    ("stofnet", "different-armadillo"),
    ("stofnet", "clean-serenity"),  # no-SGB ablation
    ("edsr", "proud-cherry"),
    ("espcn", "vital-puddle"),
    ("sincnet", "pretty-brook"),
    ("zonzini", "graceful-wave"),
]


def _roundtrip_assert(name, sd, variables, tmp_path, n_layers=2):
    out = tmp_path / "exported.pth"
    export_checkpoint(name, variables, str(out), n_layers=n_layers)
    sd2 = load_torch_state_dict(str(out))

    keys2 = {k for k in sd2 if not k.endswith("num_batches_tracked")}
    keys1 = {k for k in sd if not k.endswith("num_batches_tracked")}
    assert keys2 == keys1, (
        f"key mismatch: only-ours={sorted(keys2 - keys1)[:5]} "
        f"only-ref={sorted(keys1 - keys2)[:5]}")
    for k in keys1:
        ref = np.asarray(sd[k], np.float32)
        assert sd2[k].dtype == ref.dtype, (
            f"{k}: dtype {sd2[k].dtype} != {ref.dtype}")
        np.testing.assert_array_equal(sd2[k], ref, err_msg=k)


@pytest.mark.parametrize("name,prefix", CASES)
def test_shipped_ckpt_roundtrip(name, prefix, tmp_path):
    path = reference.ckpt_path(prefix)
    if path is None:
        pytest.skip("reference ckpts unavailable")
    sd = load_torch_state_dict(str(path))
    if name == "stofnet":
        variables, _ = import_stofnet(str(path))
    else:
        variables = import_checkpoint(name, str(path))
    _roundtrip_assert(name, sd, variables, tmp_path)


def test_unet_random_roundtrip(tmp_path):
    """No Wave-U-Net ckpt ships; round-trip a random torch init instead."""
    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    import torch

    from models.wave_unet import Model

    torch.manual_seed(0)
    m = Model(n_layers=2, channels_interval=16)
    pth = tmp_path / "unet.pth"
    torch.save(m.state_dict(), pth)

    sd = load_torch_state_dict(str(pth))
    variables = import_checkpoint("unet", str(pth), n_layers=2)
    _roundtrip_assert("unet", sd, variables, tmp_path, n_layers=2)


def test_exported_stofnet_runs_in_torch(tmp_path):
    """A JAX-trained (here: freshly initialized) StofNet exports to a .pth
    the reference torch model loads and runs, matching our forward."""
    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    import jax
    import jax.numpy as jnp
    import torch

    from models.stofnet import StofNet as TorchStofNet

    from stofnet_tpu.models import StofNet

    model = StofNet(upsample_factor=4)
    variables = model.init(jax.random.key(7), jnp.zeros((1, 1, 800)))
    pth = tmp_path / "jax_trained.pth"
    export_checkpoint("stofnet", variables, str(pth))

    tm = TorchStofNet(upsample_factor=4)
    # strict=False so the assert actually carries the key check (strict=True
    # would raise before returning, making the assert a no-op)
    missing, unexpected = tm.load_state_dict(
        torch.load(pth, map_location="cpu", weights_only=True), strict=False)
    assert not missing and not unexpected, (missing, unexpected)

    x = np.random.default_rng(0).standard_normal((2, 1, 800)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
