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


@pytest.mark.parametrize("seed", [0, 1])
def test_forward_parity_config_space(seed, tmp_path):
    """Randomized CONFIG-SPACE differential fuzz: the full StofNet option
    space (reference models/stofnet.py:11 — upsample_factor, num_features,
    num_blocks incl. even values, kernel_sizes, in_channels>1,
    semi_global_scale incl. lengths not divisible by the scale) against the
    live torch reference with transferred weights.

    Pins the reference's hard-coded conv1 padding=4 / conv_last padding=1
    (models/stofnet.py:23-24) — 'SAME' only for the default (9, ., 3)
    kernels; other kernels change the sequence length asymmetrically
    through those two layers, and our model replicates that exactly
    (r3 fuzz caught the original SAME-everywhere divergence: wrong lengths
    at k1!=9 / k3!=3 and 0.46 rel deviation at matching shapes)."""
    if torch is None:
        pytest.skip("torch unavailable")
    if not reference.available():
        pytest.skip("reference unavailable")
    from models.stofnet import StofNet as TorchStofNet

    from stofnet_tpu.models.torch_import import (load_torch_state_dict,
                                                 state_dict_to_params)

    rng = np.random.default_rng(seed)
    for trial in range(8):
        cfg, cin, length = reference.sample_stofnet_config(rng)
        label = f"seed={seed} trial={trial} cfg={cfg} cin={cin} L={length}"

        tm = TorchStofNet(in_channels=cin, **cfg)
        tm.eval()
        x = rng.standard_normal((2, cin, length)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()

        pth = tmp_path / f"fuzz_{seed}_{trial}.pth"
        torch.save(tm.state_dict(), str(pth))
        variables = state_dict_to_params(load_torch_state_dict(str(pth)))
        ours = np.asarray(StofNet(**cfg).apply(variables, jnp.asarray(x)))

        assert ours.shape == ref.shape, (
            f"{label}: shape {ours.shape} vs {ref.shape}")
        scale = max(np.abs(ref).max(), 1e-6)
        dev = np.abs(ours - ref).max() / scale
        assert dev < 2e-3, f"{label}: rel deviation {dev:.2e}"


def test_weights_init_orthogonal():
    """weights_init=True replicates the reference's _initialize_weights
    (stofnet.py:40,69-77) DISTRIBUTIONALLY (rngs differ): (semi-)orthogonal
    conv kernels with relu gain sqrt(2) on activation layers and gain 1 on
    residual-schedule layers (incl. conv{nb-1}, per the reference's
    residual list spilling past the loop) and conv_last; biases and the
    SemiGlobalBlock keep torch defaults (never touched upstream)."""
    model = StofNet(weights_init=True)
    v = model.init(jax.random.key(1), jnp.zeros((1, 1, 800)))
    params = v["params"]

    def gram_gain(kernel):
        k, i, o = kernel.shape
        m = np.asarray(kernel).reshape(k * i, o)
        g = m.T @ m if k * i >= o else m @ m.T  # gain^2 * identity
        d = float(np.sqrt(np.diag(g).mean()))
        off = np.abs(g - np.diag(np.diag(g))).max()
        assert off < 1e-4 * max(1.0, d * d), f"not orthogonal: off={off}"
        return d

    sqrt2 = 2.0 ** 0.5
    assert abs(gram_gain(params["conv1"]["kernel"]) - sqrt2) < 1e-3
    assert abs(gram_gain(params["conv2"]["kernel"]) - sqrt2) < 1e-3
    assert abs(gram_gain(params["conv3"]["kernel"]) - 1.0) < 1e-3  # residual
    assert abs(gram_gain(params["conv12"]["kernel"]) - 1.0) < 1e-3  # nb-1
    assert abs(gram_gain(params["conv_last"]["kernel"]) - 1.0) < 1e-3

    # SGB convs are NOT orthogonalized (torch-default uniform)
    w = np.asarray(params["semi_global_block"]["contract_conv"]["kernel"])
    m = w.reshape(-1, w.shape[-1])
    g = m.T @ m
    off = np.abs(g - np.diag(np.diag(g))).max()
    assert off > 1e-3, "SGB conv unexpectedly orthogonal"

    # default stays the torch-default init (existing goldens/parity rely
    # on it); weights_init only changes kernels
    v0 = StofNet().init(jax.random.key(1), jnp.zeros((1, 1, 800)))
    b1 = np.asarray(v0["params"]["conv1"]["bias"])
    b2 = np.asarray(params["conv1"]["bias"])
    np.testing.assert_array_equal(b1, b2)


def test_import_infers_full_architecture(rng, tmp_path):
    """import_stofnet infers the FULL architecture from tensor shapes, so an
    arbitrary-config .pth round-trips with no sidecar config: the model is
    rebuilt from the inferred overrides ALONE and must reproduce the torch
    forward. Default-architecture checkpoints keep the historical
    {"upsample_factor": N} overrides shape (downstream pipelines pass it
    as kwargs)."""
    if torch is None or not reference.available():
        pytest.skip("torch/reference unavailable")
    from models.stofnet import StofNet as TorchStofNet

    for trial in range(6):
        cfg, cin, length = reference.sample_stofnet_config(rng)
        if cfg["semi_global_scale"] == 1 and trial % 2:
            cfg["semi_global_scale"] = 80  # exercise the SGB-present branch
            length = 80 * int(rng.integers(4, 8))
        tm = TorchStofNet(in_channels=cin, **cfg)
        tm.eval()
        pth = tmp_path / f"arch_{trial}.pth"
        torch.save(tm.state_dict(), str(pth))

        variables, overrides = import_stofnet(str(pth))
        # inference must reconstruct the real config (defaults omitted)
        merged = dict(upsample_factor=4, num_features=64, num_blocks=13,
                      kernel_sizes=[9, 7, 3], semi_global_scale=80)
        merged.update(overrides)
        assert merged["upsample_factor"] == cfg["upsample_factor"]
        assert merged["num_features"] == cfg["num_features"]
        assert merged["num_blocks"] == cfg["num_blocks"]
        assert list(merged["kernel_sizes"]) == list(cfg["kernel_sizes"])
        assert merged["semi_global_scale"] == cfg["semi_global_scale"]

        x = rng.standard_normal((2, cin, length)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        ours = np.asarray(StofNet(**overrides).apply(variables,
                                                     jnp.asarray(x)))
        assert ours.shape == ref.shape, f"trial={trial} cfg={cfg}"
        scale = max(np.abs(ref).max(), 1e-6)
        assert np.abs(ours - ref).max() / scale < 2e-3, f"trial={trial}"

    # default-arch checkpoint: historical overrides shape preserved
    tm = TorchStofNet()
    pth = tmp_path / "default.pth"
    torch.save(tm.state_dict(), str(pth))
    _, overrides = import_stofnet(str(pth))
    assert overrides == {"upsample_factor": 4}
