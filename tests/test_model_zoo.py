"""Zoo parity: every baseline model vs its torch reference, using shipped
checkpoints where they exist and randomly-initialized torch weights where
they don't (kuleshov, unet)."""

import io

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.models import build_model, import_checkpoint

from tests import reference

torch = pytest.importorskip("torch")
reference.add_to_path()


def _import_from_torch_model(name, tm, **kwargs):
    """Round-trip a live torch module's state dict through our importer."""
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".pth", delete=False) as f:
        torch.save(tm.state_dict(), f.name)
        path = f.name
    try:
        return import_checkpoint(name, path, **kwargs)
    finally:
        os.unlink(path)


def _allclose(ours, ref, rtol=2e-3, atol_frac=2e-4):
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol_frac * scale)


def test_edsr_parity(rng):
    path = reference.ckpt_path("proud-cherry")
    if path is None:
        pytest.skip("ckpt missing")
    from models.edsr_1d import EDSR_1D

    tm = EDSR_1D(num_channels=1, num_features=64, num_blocks=8, upscale_factor=4)
    tm.load_state_dict(torch.load(str(path), map_location="cpu", weights_only=True))
    tm.eval()
    n_params = sum(p.numel() for p in tm.parameters())
    assert n_params == 210_289  # BASELINE.md

    model, _ = build_model("edsr", upsample_factor=4)
    variables = import_checkpoint("edsr", str(path))

    x = rng.standard_normal((2, 1, 800)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape == (2, 1, 3200)
    _allclose(ours, ref)


def test_espcn_parity(rng):
    path = reference.ckpt_path("vital-puddle")
    if path is None:
        pytest.skip("ckpt missing")
    from models.espcn_1d import ESPCN_1D

    tm = ESPCN_1D(upscale_factor=4)
    tm.load_state_dict(torch.load(str(path), map_location="cpu", weights_only=True))
    tm.eval()
    assert sum(p.numel() for p in tm.parameters()) == 6_948

    model, _ = build_model("espcn", upsample_factor=4)
    variables = import_checkpoint("espcn", str(path))

    x = rng.standard_normal((2, 1, 500)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    _allclose(ours, ref, rtol=1e-4, atol_frac=1e-5)  # sigmoid output, tame


def test_zonzini_small_parity(rng):
    path = reference.ckpt_path("graceful-wave")
    if path is None:
        pytest.skip("ckpt missing")
    from models.zonzini import ZonziniNetSmall as TorchSmall

    tm = TorchSmall()
    tm.load_state_dict(torch.load(str(path), map_location="cpu", weights_only=True))
    tm.eval()
    assert sum(p.numel() for p in tm.parameters()) == 134_481

    model, _ = build_model("zonzini", dataset_kind="chirp")
    variables = import_checkpoint("zonzini", str(path))

    x = rng.standard_normal((3, 1, 2000)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape == (3, 1)
    _allclose(ours, ref, rtol=1e-3)


def test_zonzini_large_parity(rng):
    from models.zonzini import ZonziniNetLarge as TorchLarge

    torch.manual_seed(0)
    tm = TorchLarge().eval()
    model, _ = build_model("zonzini", dataset_kind="pala")
    variables = _import_from_torch_model("zonzini", tm)

    x = rng.standard_normal((2, 1, 6400)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    _allclose(ours, ref, rtol=1e-3)


@pytest.mark.parametrize("prefix,rf_scale", [("pretty-brook", 10)])
def test_sincnet_parity(rng, prefix, rf_scale):
    path = reference.ckpt_path(prefix)
    if path is None:
        pytest.skip("ckpt missing")
    import collections, collections.abc

    # the reference targets py<3.10 where collections.Sequence existed
    if not hasattr(collections, "Sequence"):
        collections.Sequence = collections.abc.Sequence
    from models.sincnet import SincNet as TorchSincNet

    L = 1000 * rf_scale
    fs = 1.953125e6 * rf_scale  # any consistent fs works for parity
    params = {
        "input_dim": L, "fs": fs,
        "cnn_N_filt": [128, 128, 128, 1],
        "cnn_len_filt": [1023, 11, 9, 7],
        "cnn_max_pool_len": [1, 1, 1, 1],
        "cnn_use_laynorm_inp": False, "cnn_use_batchnorm_inp": False,
        "cnn_use_laynorm": [False] * 4, "cnn_use_batchnorm": [True] * 4,
        "cnn_act": ["leaky_relu"] * 3 + ["linear"],
        "cnn_drop": [0.0] * 4, "use_sinc": True,
    }
    tm = TorchSincNet(params)
    tm.load_state_dict(torch.load(str(path), map_location="cpu", weights_only=True))
    tm.eval()
    # 329,859 trainable params (+774 BN running-stat buffers = the 330,633
    # state-dict numel reported in BASELINE.md)
    assert sum(p.numel() for p in tm.parameters()) == 329_859

    model, updates = build_model("sincnet", fs=fs / rf_scale,
                                 rf_scale_factor=rf_scale)
    assert updates == {"upsample_factor": 1}
    variables = import_checkpoint("sincnet", str(path))

    x = rng.standard_normal((2, 1, L)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape == (2, 1, L)
    _allclose(ours, ref, rtol=2e-3, atol_frac=1e-3)


def test_waveunet_parity(rng):
    from models.wave_unet import Model as TorchWaveUnet

    torch.manual_seed(0)
    tm = TorchWaveUnet(n_layers=2, channels_interval=16).eval()
    model, updates = build_model("unet", dataset_kind="chirp",
                                 rf_scale_factor=10, upsample_factor=4)
    assert updates == {"rf_scale_factor": 40, "upsample_factor": 1}
    variables = _import_from_torch_model("unet", tm, n_layers=2)

    x = rng.standard_normal((2, 1, 512)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape
    _allclose(ours, ref, rtol=1e-3, atol_frac=1e-4)


def test_kuleshov_parity(rng):
    from models.kuleshov import Kuleshov as TorchKuleshov

    n_in, up = 1000, 4
    torch.manual_seed(0)
    tm = TorchKuleshov(input_length=n_in, output_length=n_in * up).eval()
    model, _ = build_model("kuleshov", sample_num=100, rf_scale_factor=10,
                           upsample_factor=up)
    variables = _import_from_torch_model("kuleshov", tm)

    x = rng.standard_normal((2, 1, n_in)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape == (2, 1, n_in * up)
    _allclose(ours, ref, rtol=2e-3, atol_frac=1e-3)


def test_fc_dimensions_matches_reference():
    from models.kuleshov import Kuleshov as TorchKuleshov
    from stofnet_tpu.models.kuleshov import fc_dimensions

    tm = TorchKuleshov(input_length=1000, output_length=4000)
    assert fc_dimensions(1000) == tm.fc_dimensions(
        [128, 256, 512, 512], [65, 33, 17, 9, 9, 9, 9, 9, 9])


def test_zonzini_rejects_nan_window_lengths(rng):
    """Lengths where the final stage's conv emits width 1 but the pool
    emits width 0 (e.g. L=820 for the Small net) must raise, not NaN."""
    import jax

    from stofnet_tpu.models import ZonziniNetSmall

    model = ZonziniNetSmall()
    x = jnp.zeros((1, 1, 820), jnp.float32)
    with pytest.raises(ValueError, match="too short"):
        model.init(jax.random.PRNGKey(0), x)

    ok = jnp.zeros((1, 1, 1000), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), ok)
    out = np.asarray(model.apply(v, ok))
    assert np.isfinite(out).all()


def test_edsr_config_space_fuzz(rng):
    """Randomized EDSR option space (reference edsr_1d.py:23 —
    num_channels, num_features, num_blocks, upscale_factor) vs the live
    reference with transferred weights. num_features is clamped to a
    multiple of upscale_factor: the reference's PixelShuffle1D requires
    it (num_features % upscale != 0 crashes upstream)."""
    from models.edsr_1d import EDSR_1D

    from stofnet_tpu.models.edsr1d import EDSR1D

    for trial in range(5):
        nc = int(rng.choice([1, 2]))
        up = int(rng.choice([2, 4, 8]))
        nf = max(up, (int(rng.choice([16, 32, 48, 64])) // up) * up)
        nb = int(rng.choice([2, 4, 8]))
        length = int(rng.integers(40, 200))
        label = f"trial={trial} nc={nc} nf={nf} nb={nb} up={up} L={length}"

        tm = EDSR_1D(num_channels=nc, num_features=nf, num_blocks=nb,
                     upscale_factor=up)
        tm.eval()
        x = rng.standard_normal((2, nc, length)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        ours = np.asarray(
            EDSR1D(num_channels=nc, num_features=nf, num_blocks=nb,
                   upscale_factor=up).apply(
                _import_from_torch_model("edsr", tm), jnp.asarray(x)))
        assert ours.shape == ref.shape, label
        _allclose(ours, ref)


def test_waveunet_config_space_fuzz(rng):
    """Randomized Wave-U-Net option space (reference wave_unet.py:35 —
    n_layers up to the paper's 12, channels_interval) vs the live
    reference. Input length must be divisible by 2**n_layers (the
    reference's slicing downsample floors otherwise and its skip-concat
    crashes)."""
    from models.wave_unet import Model as TorchWaveUnet

    from stofnet_tpu.models.wave_unet import WaveUnet

    for trial, (nl, ci) in enumerate([(2, 8), (4, 24), (6, 16), (12, 8)]):
        length = (2 ** nl) * int(rng.integers(2, 6))
        label = f"trial={trial} n_layers={nl} ci={ci} L={length}"

        tm = TorchWaveUnet(n_layers=nl, channels_interval=ci)
        tm.eval()
        x = rng.standard_normal((2, 1, length)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        ours = np.asarray(
            WaveUnet(n_layers=nl, channels_interval=ci).apply(
                _import_from_torch_model("unet", tm, n_layers=nl),
                jnp.asarray(x), train=False))
        assert ours.shape == ref.shape, label
        _allclose(ours, ref)


def test_kuleshov_num_layers_quirk(rng):
    """Reference quirk (kuleshov.py:20): num_layers != 4 CRASHES upstream —
    the bottleneck conv and fc-width arithmetic hard-code the 4-deep
    filter schedule (negative tensor dims at nl=2, channel mismatches at
    nl=3). Ours runs at any 1 <= num_layers <= 4 (analytic fc_dimensions);
    at the only reference-working depth (nl=4) weights transfer exactly
    (test_kuleshov_parity + the fuzz here)."""
    from models.kuleshov import Kuleshov as TorchKuleshov

    from stofnet_tpu.models.kuleshov import Kuleshov

    # the reference's crash, pinned (construction or forward)
    with pytest.raises(RuntimeError):
        tm = TorchKuleshov(input_length=1024, output_length=4096,
                           num_layers=2)
        tm(torch.from_numpy(np.zeros((1, 1, 1024), np.float32)))

    # ours runs and upsamples at the same config
    m = Kuleshov(input_length=1024, output_length=4096, num_layers=2)
    v = m.init(jax.random.key(0), jnp.zeros((1, 1, 1024)), train=False)
    y = m.apply(v, jnp.zeros((2, 1, 1024)), train=False)
    assert y.shape == (2, 1, 4096)

    # nl=4 at a non-default length: weight-transfer parity holds
    tm = TorchKuleshov(input_length=2048, output_length=8192, num_layers=4)
    tm.eval()
    x = rng.standard_normal((2, 1, 2048)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        Kuleshov(input_length=2048, output_length=8192, num_layers=4).apply(
            _import_from_torch_model("kuleshov", tm), jnp.asarray(x),
            train=False))
    assert ours.shape == ref.shape == (2, 1, 8192)
    _allclose(ours, ref)


def test_espcn_upscale_fuzz(rng):
    """ESPCN's whole option space is one knob (reference espcn_1d.py:9 —
    upscale_factor); with this the full documented option space of EVERY
    model family is fuzz- or golden-pinned (StofNet/EDSR/Wave-U-Net
    config fuzz, SincNet 8-config goldens, Kuleshov depth quirk, Zonzini
    fixed nets)."""
    from models.espcn_1d import ESPCN_1D

    from stofnet_tpu.models.espcn1d import ESPCN1D

    for up in (1, 2, 8):
        length = int(rng.integers(40, 200))
        tm = ESPCN_1D(upscale_factor=up)
        tm.eval()
        x = rng.standard_normal((2, 1, length)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        ours = np.asarray(ESPCN1D(upscale_factor=up).apply(
            _import_from_torch_model("espcn", tm), jnp.asarray(x)))
        assert ours.shape == ref.shape == (2, 1, length * up), f"up={up}"
        _allclose(ours, ref)
