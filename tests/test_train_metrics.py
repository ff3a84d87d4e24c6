"""Golden tests: toa_rmse / losses / find_threshold vs the reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from stofnet_tpu.train import (
    toa_rmse,
    heatmap_loss,
    regression_loss,
    find_threshold,
)
from stofnet_tpu.ops import coords2mask

from tests import reference

torch = pytest.importorskip("torch")
reference.add_to_path()


def _cmp_metrics(gt, es, tol):
    from utils.metrics import toa_rmse as ref_toa_rmse

    ours = np.asarray(toa_rmse(jnp.asarray(gt), jnp.asarray(es), tol=tol))
    ref = ref_toa_rmse(torch.from_numpy(gt), torch.from_numpy(es), tol=tol).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5, equal_nan=True)


def test_toa_rmse_basic(rng):
    gt = np.array([[10.0, 50.0, 0.0], [20.0, 0.0, 0.0]], dtype=np.float32)
    es = np.array([[10.4, 49.2, 200.0, 0.0], [20.05, 0.0, 0.0, 0.0]], dtype=np.float32)
    _cmp_metrics(gt, es, tol=1.0)


def test_toa_rmse_random(rng):
    gt = rng.uniform(0, 100, size=(8, 5)).astype(np.float32)
    gt[gt < 30] = 0  # some invalid
    es = gt + rng.normal(0, 1, size=gt.shape).astype(np.float32)
    es[rng.random(es.shape) < 0.3] = 0
    _cmp_metrics(gt, es, tol=2.0)


def test_toa_rmse_empty_rows():
    gt = np.array([[0.0, 0.0], [5.0, 0.0]], dtype=np.float32)
    es = np.array([[1.0, 2.0], [0.0, 0.0]], dtype=np.float32)
    _cmp_metrics(gt, es, tol=1.0)


def test_toa_rmse_nan_inf():
    gt = np.array([[np.nan, 7.0, np.inf]], dtype=np.float32)
    es = np.array([[7.5, np.nan, 0.0]], dtype=np.float32)
    _cmp_metrics(gt, es, tol=1.0)


def test_toa_rmse_no_match_within_tol():
    gt = np.array([[10.0]], dtype=np.float32)
    es = np.array([[99.0]], dtype=np.float32)
    _cmp_metrics(gt, es, tol=1.0)


def test_heatmap_loss_matches_reference(rng):
    """Replicates main.py:224-232 loss computation end to end."""
    import torch.nn.functional as F
    from utils.gaussian import gaussian_kernel as ref_gauss
    from utils.mask2samples import coords2mask as ref_coords2mask

    b, l_out, up = 4, 512, 4
    masks_pred = rng.standard_normal((b, 1, l_out)).astype(np.float32)
    gt_sample = rng.uniform(5, l_out // up - 5, size=(b, 1)).astype(np.float32)
    gt_true = np.round(gt_sample[:, None] * up).astype(np.int64)  # (B,1,1)

    ours_loss, ours_mask = heatmap_loss(
        jnp.asarray(masks_pred), jnp.asarray(gt_true),
        kernel_size=7, sigma=1.0, mask_amplitude=20.0, lambda_value=1e-2,
    )

    tp = torch.from_numpy(masks_pred)
    k = torch.tensor(ref_gauss(7, 1.0), dtype=torch.float32)[None, None]
    masks_true = ref_coords2mask(torch.from_numpy(gt_true.copy()), torch.zeros(b, 1, l_out))
    blur = F.conv1d(masks_true, k, padding=3)
    blur = blur / blur.max() * 20.0
    ref_loss = F.mse_loss(tp.squeeze(1), blur.squeeze(1)) + 1e-2 * tp.squeeze(1).abs().mean()

    np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ours_mask), masks_true.numpy())


def test_regression_loss_first_valid(rng):
    gt_sample = np.array([[0.0, 12.5, 7.25], [0.0, 0.0, 0.0]], dtype=np.float32)
    gt_true = np.round(gt_sample).astype(np.int64)
    pred = np.array([[7.0], [0.5]], dtype=np.float32)
    loss, target = regression_loss(
        jnp.asarray(pred), jnp.asarray(gt_sample), jnp.asarray(gt_true)
    )
    # row 0: earliest valid ToA is 7.25; row 1: all invalid -> slot 0 -> 0.0
    np.testing.assert_allclose(np.asarray(target), [[7.25], [0.0]])
    np.testing.assert_allclose(
        float(loss), np.mean([(7.0 - 7.25) ** 2, 0.25]), rtol=1e-6
    )


@pytest.mark.parametrize("norm_opt", [False, True])
def test_find_threshold_matches_sklearn(rng, norm_opt):
    from utils.threshold import find_threshold as ref_find_threshold

    b, l = 2, 256
    masks_pred = rng.standard_normal((b, 1, l)).astype(np.float32)
    pos = rng.choice(l, size=6, replace=False)
    masks_true = np.zeros((b, 1, l), dtype=np.float32)
    masks_true[0, 0, pos] = 1.0
    masks_pred[0, 0, pos] += 2.0  # make the ROC informative

    ours = find_threshold(masks_pred, masks_true, norm_opt=norm_opt)
    ref = ref_find_threshold(
        torch.from_numpy(masks_pred.copy()), torch.from_numpy(masks_true),
        window_size=20, norm_opt=norm_opt,
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-6, atol=1e-9)


def test_find_threshold_global_pos_label(rng):
    """The positive-label value is the GLOBAL masks_true.max()
    (threshold.py:17), not element 0's max — when element 1 carries larger
    spike amplitudes, element 0 has NO positives and the result is the
    degenerate inf, exactly like the reference."""
    from utils.threshold import find_threshold as ref_find_threshold

    b, l = 2, 128
    masks_pred = rng.standard_normal((b, 1, l)).astype(np.float32)
    masks_true = np.zeros((b, 1, l), dtype=np.float32)
    masks_true[0, 0, [5, 30]] = 1.0
    masks_true[1, 0, [7, 40]] = 2.0  # global max lives in element 1

    import warnings

    ours = find_threshold(masks_pred, masks_true)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # sklearn's expected
        # UndefinedMetricWarning for the all-negative element
        ref = ref_find_threshold(
            torch.from_numpy(masks_pred.copy()),
            torch.from_numpy(masks_true), window_size=20, norm_opt=False,
        )
    assert np.isinf(ref) and np.isinf(ours)


def test_find_threshold_degenerate_all_negative(rng):
    """Element 0 with no GT spikes: sklearn>=1.3 emits NaN rates and an inf
    leading threshold; argmax lands on index 0 in both implementations."""
    from utils.threshold import find_threshold as ref_find_threshold

    b, l = 2, 128
    masks_pred = rng.standard_normal((b, 1, l)).astype(np.float32)
    masks_true = np.zeros((b, 1, l), dtype=np.float32)
    masks_true[1, 0, [7, 40]] = 1.0  # positives only in element 1

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = ref_find_threshold(
            torch.from_numpy(masks_pred.copy()),
            torch.from_numpy(masks_true), window_size=20, norm_opt=False,
        )
    ours = find_threshold(masks_pred, masks_true)
    assert np.isinf(float(ref)) and np.isinf(ours)
