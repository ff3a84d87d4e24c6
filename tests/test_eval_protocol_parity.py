"""END-TO-END eval-protocol parity: the reference's evaluation loop
(composed from its own modules exactly as main.py:291-347 wires them) vs
our ``cli.main.evaluate`` on the SAME synthetic dataset and the SAME
shipped checkpoint. Per-stage goldens prove each op; this proves the whole
protocol — decode thresholds, GT rounding, tolerance matching, nan-mean
summary — composes to the same benchmark numbers."""

import numpy as np
import pytest
import jax.numpy as jnp  # noqa: F401  (jax initialized by conftest)

from stofnet_tpu.cli.main import DEFAULT_CONFIG, run
from stofnet_tpu.data.chirp import ChirpDataset
from stofnet_tpu.data.loader import DataLoader
from stofnet_tpu.data.synthetic import generate_chirp_dataset
from stofnet_tpu.utils.config import load_config

from tests import reference

torch = pytest.importorskip("torch")
reference.add_to_path()

ETOL = 1600.0  # squared samples (the synthetic stand-in has a known
# onset-convention bias vs the hardware-trained ckpt; see test_cli_e2e)
RF_SCALE = 4
SAMPLE_NUM = 400  # L = 1600 (divisible by the SemiGlobalBlock's 80)


@pytest.fixture(scope="module")
def chirp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("protoparity") / "stof_chirp101_dataset"
    return generate_chirp_dataset(root, n_positions=3, n_train_per_pos=2,
                                  n_test_per_pos=4, sample_num=SAMPLE_NUM)


def reference_eval(chirp_root):
    """The reference eval loop, verbatim semantics (main.py:291-347):
    model forward -> mask2coords -> toa_rmse, nan-mean summary."""
    from models import StofNet as TorchStofNet
    from utils.mask2samples import mask2coords
    from utils.metrics import toa_rmse

    path = reference.ckpt_path("different-armadillo")
    tm = TorchStofNet(upsample_factor=4)
    tm.load_state_dict(torch.load(str(path), map_location="cpu",
                                  weights_only=True))
    tm.eval()

    from stofnet_tpu.data.transforms import Compose, NormalizeVol

    # the reference applies NormalizeVol unconditionally (main.py:49)
    ds = ChirpDataset(chirp_root, split_dirname="test",
                      rf_scale_factor=RF_SCALE,
                      transforms=Compose([NormalizeVol()]))
    loader = DataLoader(ds, batch_size=2, drop_last=True)

    dists, jaccs = [], []
    with torch.no_grad():
        for batch in loader:
            _, rf, _, gt_sample, _, _ = batch
            frame = torch.from_numpy(rf.astype(np.float32)).unsqueeze(1)
            gt = torch.from_numpy(
                gt_sample.astype(np.float32)).reshape(-1, 1)
            gt[(gt <= 0) | torch.isnan(gt)] = 0  # main.py:304-305

            masks_pred = tm(frame)
            es = mask2coords(masks_pred, window_size=20, threshold=None,
                             upsample_factor=4)  # main.py:320
            errs = toa_rmse(gt, es, tol=ETOL)  # main.py:347
            dists.append(errs[:, 0].numpy())
            jaccs.append(errs[:, 3].numpy())
    d = np.concatenate(dists)
    j = np.concatenate(jaccs)
    return float(np.nanmean(d)), float(np.nanmean(j))


def test_eval_protocol_matches_reference(chirp_root, tmp_path):
    if reference.ckpt_path("different-armadillo") is None:
        pytest.skip("reference ckpts unavailable")

    cfg = load_config(DEFAULT_CONFIG)
    cfg.update(run_dir=str(tmp_path / "runs"),
               ckpt_dir="/root/reference/ckpts",
               data_dir=str(chirp_root), evaluate=True, batch_size=2,
               model="stofnet", model_file="different-armadillo", th=None,
               rf_scale_factor=RF_SCALE, max_echoes=8, etol=ETOL,
               save_artifacts=False)
    ours = run(cfg)

    ref_dist, ref_jacc = reference_eval(chirp_root)

    # identical data, ckpt, and protocol; f32 both sides -> tight agreement
    assert ours["total_distance_mean"] == pytest.approx(ref_dist, abs=0.05)
    assert ours["total_jaccard"] == pytest.approx(ref_jacc, abs=0.5)


def test_gradpeak_protocol_matches_reference(chirp_root, tmp_path):
    """Classical-path protocol (main.py:161-165,332-347): GradPeak echoes
    straight into toa_rmse, nan-mean summary."""
    from models.gradpeak import GradPeak as TorchGradPeak
    from utils.metrics import toa_rmse

    from stofnet_tpu.data.transforms import Compose, NormalizeVol

    rf = 6  # grad_step = rf//6*5 = 5 (the reference crashes for rf < 6)
    cfg = load_config(DEFAULT_CONFIG)
    cfg.update(run_dir=str(tmp_path / "runs"), data_dir=str(chirp_root),
               evaluate=True, batch_size=2, model="gradpeak", th=None,
               rf_scale_factor=rf, max_echoes=8, etol=ETOL,
               save_artifacts=False)
    ours = run(cfg)

    tm = TorchGradPeak(threshold=None, rescale_factor=rf, echo_max=1,
                       onset_opt=True)  # chirp config, main.py:163-164
    ds = ChirpDataset(chirp_root, split_dirname="test", rf_scale_factor=rf,
                      transforms=Compose([NormalizeVol()]))
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    dists, jaccs = [], []
    with torch.no_grad():
        for batch in loader:
            _, rfd, _, gt_sample, _, _ = batch
            frame = torch.from_numpy(rfd.astype(np.float32)).unsqueeze(1)
            gt = torch.from_numpy(
                gt_sample.astype(np.float32)).reshape(-1, 1)
            gt[(gt <= 0) | torch.isnan(gt)] = 0
            es = tm(frame)  # (B, echoes) onset column, main.py:332-334
            errs = toa_rmse(gt, es, tol=ETOL)
            dists.append(errs[:, 0].numpy())
            jaccs.append(errs[:, 3].numpy())
    ref_dist = float(np.nanmean(np.concatenate(dists)))
    ref_jacc = float(np.nanmean(np.concatenate(jaccs)))

    assert ours["total_distance_mean"] == pytest.approx(ref_dist, abs=0.1)
    assert ours["total_jaccard"] == pytest.approx(ref_jacc, abs=0.5)


def test_zonzini_protocol_matches_reference(chirp_root, tmp_path):
    """Regression-path protocol (main.py:332-347): raw scalar prediction
    straight into toa_rmse, shipped graceful-wave weights."""
    if reference.ckpt_path("graceful-wave") is None:
        pytest.skip("reference ckpts unavailable")
    from models import ZonziniNetSmall as TorchZonzini
    from utils.metrics import toa_rmse

    from stofnet_tpu.data.transforms import Compose, NormalizeVol

    cfg = load_config(DEFAULT_CONFIG)
    cfg.update(run_dir=str(tmp_path / "runs"),
               ckpt_dir="/root/reference/ckpts",
               data_dir=str(chirp_root), evaluate=True, batch_size=2,
               model="zonzini", model_file="graceful-wave", th=None,
               rf_scale_factor=RF_SCALE, max_echoes=8, etol=ETOL,
               save_artifacts=False)
    ours = run(cfg)

    tm = TorchZonzini()
    tm.load_state_dict(torch.load(
        str(reference.ckpt_path("graceful-wave")), map_location="cpu",
        weights_only=True))
    tm.eval()
    ds = ChirpDataset(chirp_root, split_dirname="test",
                      rf_scale_factor=RF_SCALE,
                      transforms=Compose([NormalizeVol()]))
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    dists, jaccs = [], []
    with torch.no_grad():
        for batch in loader:
            _, rfd, _, gt_sample, _, _ = batch
            frame = torch.from_numpy(rfd.astype(np.float32)).unsqueeze(1)
            gt = torch.from_numpy(
                gt_sample.astype(np.float32)).reshape(-1, 1)
            gt[(gt <= 0) | torch.isnan(gt)] = 0
            es = tm(frame)  # (B, 1) scalar ToA, main.py:334
            errs = toa_rmse(gt, es, tol=ETOL)
            dists.append(errs[:, 0].numpy())
            jaccs.append(errs[:, 3].numpy())
    ref_dist = float(np.nanmean(np.concatenate(dists)))
    ref_jacc = float(np.nanmean(np.concatenate(jaccs)))

    assert ours["total_distance_mean"] == pytest.approx(ref_dist, abs=0.05,
                                                        nan_ok=True)
    assert ours["total_jaccard"] == pytest.approx(ref_jacc, abs=0.5)


def test_unet_protocol_matches_reference(chirp_root, tmp_path):
    """Wave-U-Net branch: the driver folds upsampling into input
    interpolation (main.py:44-46: rf_scale *= upsample, upsample = 1)
    BEFORE the dataset build — verified end-to-end vs the reference flow
    (no ckpt ships; both sides run the same random torch init)."""
    from models import WaveUnet as TorchWaveUnet
    from utils.mask2samples import mask2coords
    from utils.metrics import toa_rmse

    from stofnet_tpu.data.transforms import Compose, NormalizeVol
    from stofnet_tpu.models.registry import export_checkpoint
    from stofnet_tpu.models import build_model

    torch.manual_seed(0)
    tm = TorchWaveUnet(n_layers=2, channels_interval=16)  # chirp config
    tm.eval()
    pth = tmp_path / "unet.pth"
    torch.save(tm.state_dict(), pth)

    cfg = load_config(DEFAULT_CONFIG)
    cfg.update(run_dir=str(tmp_path / "runs"), ckpt_dir=str(tmp_path),
               data_dir=str(chirp_root), evaluate=True, batch_size=2,
               model="unet", model_file="unet", th=None,
               rf_scale_factor=2, upsample_factor=4, max_echoes=8,
               etol=ETOL, save_artifacts=False)
    ours = run(cfg)
    assert cfg.rf_scale_factor == 8 and cfg.upsample_factor == 1  # folded

    # reference flow: dataset at the folded rf scale, model at x1
    ds = ChirpDataset(chirp_root, split_dirname="test", rf_scale_factor=8,
                      transforms=Compose([NormalizeVol()]))
    loader = DataLoader(ds, batch_size=2, drop_last=True)
    dists, jaccs = [], []
    with torch.no_grad():
        for batch in loader:
            _, rfd, _, gt_sample, _, _ = batch
            frame = torch.from_numpy(rfd.astype(np.float32)).unsqueeze(1)
            gt = torch.from_numpy(
                gt_sample.astype(np.float32)).reshape(-1, 1)
            gt[(gt <= 0) | torch.isnan(gt)] = 0
            masks_pred = tm(frame)
            es = mask2coords(masks_pred, window_size=20, threshold=None,
                             upsample_factor=1)
            errs = toa_rmse(gt, es, tol=ETOL)
            dists.append(errs[:, 0].numpy())
            jaccs.append(errs[:, 3].numpy())
    ref_dist = float(np.nanmean(np.concatenate(dists)))
    ref_jacc = float(np.nanmean(np.concatenate(jaccs)))

    assert ours["total_distance_mean"] == pytest.approx(ref_dist, abs=0.05,
                                                        nan_ok=True)
    assert ours["total_jaccard"] == pytest.approx(ref_jacc, abs=0.5)
