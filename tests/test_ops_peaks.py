"""Golden tests: NMS / thresholding / mask2coords / coords2mask vs reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from stofnet_tpu.ops import (
    nms1d,
    threshold_scores,
    mask2coords,
    coords2mask,
    get_amplitudes,
)

from tests import reference

torch = pytest.importorskip("torch")
reference.add_to_path()


def make_heatmap(rng, b=4, l=512, peaks=5, noise=0.05):
    """Sparse positive heatmap with noise floor, like a trained model output."""
    hm = noise * rng.random((b, 1, l)).astype(np.float32)
    for bi in range(b):
        pos = rng.choice(np.arange(10, l - 10), size=peaks, replace=False)
        hm[bi, 0, pos] = 1.0 + rng.random(peaks).astype(np.float32)
    return hm


@pytest.mark.parametrize("window", [20, 7, 31])
def test_nms1d_matches_reference(rng, window):
    from utils.mask2samples import nms_1d

    hm = make_heatmap(rng)
    ours = np.asarray(nms1d(jnp.asarray(hm), window))
    ref = nms_1d(torch.from_numpy(hm), window).numpy()
    np.testing.assert_allclose(ours, ref.reshape(ours.shape), rtol=1e-6)


@pytest.mark.parametrize("th", [0.5, None])
def test_thresholding_matches_reference(rng, th):
    from utils.mask2samples import thresholding

    hm = make_heatmap(rng)
    ours = np.asarray(threshold_scores(jnp.asarray(hm), th))
    ref = thresholding(torch.from_numpy(hm.copy()), th).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


@pytest.mark.parametrize("th,upsample", [(0.5, 4), (None, 1), (0.9, 2)])
def test_mask2coords_matches_reference(rng, th, upsample):
    from utils.mask2samples import mask2coords as ref_mask2coords

    hm = make_heatmap(rng, b=6, l=1024, peaks=7)
    ours = np.asarray(
        mask2coords(jnp.asarray(hm), window_size=20, threshold=th,
                    upsample_factor=upsample, max_echoes=32)
    )
    ref = ref_mask2coords(
        torch.from_numpy(hm.copy()), window_size=20, threshold=th,
        upsample_factor=upsample,
    ).numpy()

    # compare as sets of valid detections per row (both pad with zeros)
    for bi in range(hm.shape[0]):
        ours_v = np.sort(ours[bi][ours[bi] != 0])
        ref_v = np.sort(ref[bi][ref[bi] != 0])
        np.testing.assert_allclose(ours_v, ref_v, rtol=1e-6)


def test_mask2coords_no_detections(rng):
    hm = np.zeros((2, 1, 128), dtype=np.float32)
    out = np.asarray(mask2coords(jnp.asarray(hm), 20, threshold=0.5, max_echoes=8))
    assert (out == 0).all()


def test_mask2coords_all_negative_matches_reference():
    """All-negative heatmap: NMS zeros become the row max, so the reference's
    per-row-max thresholding drops even the strongest (negative) peak and no
    detection is reported. We must match that."""
    from utils.mask2samples import mask2coords as ref_mask2coords

    hm = -np.ones((1, 1, 64), dtype=np.float32)
    hm[0, 0, 17] = -0.1  # row max of the raw scores, still negative
    ours = np.asarray(mask2coords(jnp.asarray(hm), 5, threshold=None, max_echoes=4))
    ref = ref_mask2coords(torch.from_numpy(hm.copy()), 5, None).numpy()
    assert (ours == 0).all()
    assert (ref == 0).all()


def test_coords2mask_matches_reference(rng):
    from utils.mask2samples import coords2mask as ref_coords2mask

    b, l = 4, 256
    coords = rng.integers(0, l, size=(b, 1, 3)).astype(np.int64)
    coords[0, 0, 0] = -3  # negative -> parking slot 0 -> dropped
    ours = np.asarray(coords2mask(jnp.asarray(coords), l))
    ref = ref_coords2mask(
        torch.from_numpy(coords.copy()), torch.zeros((b, 1, l))
    ).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_roundtrip_coords_mask_coords(rng):
    """coords2mask o mask2coords recovers the planted positions."""
    b, l = 3, 512
    pos = np.sort(rng.choice(np.arange(16, l - 1, 11), size=(4,), replace=False))
    coords = np.tile(pos[None, None], (b, 1, 1)).astype(np.int64)
    mask = coords2mask(jnp.asarray(coords), l)
    rec = np.asarray(mask2coords(mask, window_size=3, threshold=0.5, max_echoes=8))
    for bi in range(b):
        got = np.sort(rec[bi][rec[bi] != 0]).astype(np.int64)
        np.testing.assert_array_equal(got, pos)


def test_nms_idempotent(rng):
    hm = make_heatmap(rng)
    once = nms1d(jnp.asarray(hm), 9)
    twice = nms1d(once, 9)
    np.testing.assert_array_equal(np.asarray(once), np.asarray(twice))


def test_get_amplitudes(rng):
    frames = rng.standard_normal((2, 64)).astype(np.float32)
    samples = np.array([[3.2, 10.7], [0.0, 63.0]], dtype=np.float32)
    amps = np.asarray(get_amplitudes(jnp.asarray(frames), jnp.asarray(samples)))
    assert amps[0, 0] == frames[0, 3]
    assert amps[0, 1] == frames[0, 11]
    assert amps[1, 1] == frames[1, 63]


def test_batch_mask2coords_matches_reference(rng):
    from utils.mask2samples import batch_mask2coords as ref_batch
    from stofnet_tpu.ops.peaks import batch_mask2coords

    b, c, l = 2, 3, 256
    hm = 0.05 * rng.random((b, c, l)).astype(np.float32)
    for bi in range(b):
        for ci in range(c):
            pos = rng.choice(np.arange(10, l - 10), size=3, replace=False)
            hm[bi, ci, pos] = 1.0 + rng.random(3).astype(np.float32)

    ours = np.asarray(batch_mask2coords(jnp.asarray(hm), 9, threshold=0.5,
                                        upsample_factor=2, max_echoes=8))
    ref = ref_batch(torch.from_numpy(hm.copy()), 9, threshold=0.5,
                    upsample_factor=2).numpy()
    for bi in range(b):
        for ci in range(c):
            a = np.sort(ours[bi, ci][ours[bi, ci] != 0])
            r = np.sort(ref[bi, ci][ref[bi, ci] != 0])
            np.testing.assert_allclose(a, r, rtol=1e-6)


def test_coords_to_nested_list():
    from stofnet_tpu.ops.peaks import coords_to_nested_list

    coords = np.array([[[3.0, 7.0, 0.0], [0.0, 0.0, 0.0]]])
    out = coords_to_nested_list(coords)
    assert out == [[[3.0, 7.0], []]]


def test_coords2mask_drops_out_of_range():
    """Positions >= length produce NO spike (the reference raises an index
    error there; a clamped phantom spike at length-1 would corrupt the
    training mask). Negatives park at the invalid slot 0 (forced to 0)."""
    import jax.numpy as jnp

    from stofnet_tpu.ops.peaks import coords2mask

    coords = jnp.asarray([[10.0, 300.0, -5.0, 0.0]])
    mask = np.asarray(coords2mask(coords, 256))
    assert mask[0, 10] == 1.0
    assert mask.sum() == 1.0  # 300 dropped, -5 and 0 parked at slot 0 (=0)
    assert mask[0, 255] == 0.0 and mask[0, 0] == 0.0


@pytest.mark.parametrize("seed", [11, 23, 37, 59, 71])
def test_decode_fuzz_matches_reference(seed):
    """Randomized sweep over decode configurations: NMS window, threshold
    mode (incl. the knife-edge per-channel-max mode), upsample factor, and
    raw-noise heatmaps (maximal tie risk) — detections must match the
    reference for every draw."""
    from utils.mask2samples import mask2coords as ref_mask2coords

    r = np.random.default_rng(seed)
    for _ in range(6):
        b = int(r.integers(1, 5))
        l = int(r.choice([256, 500, 1024]))
        window = int(r.choice([5, 11, 20, 33]))
        upsample = int(r.choice([1, 2, 4]))
        th = r.choice([None, 0.05, 0.5, 2.0])
        th = None if th is None else float(th)
        if r.random() < 0.5:
            hm = make_heatmap(r, b=b, l=l, peaks=int(r.integers(1, 9)))
        else:  # raw noise: every sample is a potential NMS tie
            hm = r.standard_normal((b, 1, l)).astype(np.float32)

        ours = np.asarray(mask2coords(
            jnp.asarray(hm), window_size=window, threshold=th,
            upsample_factor=upsample, max_echoes=l))
        ref = ref_mask2coords(
            torch.from_numpy(hm.copy()), window_size=window, threshold=th,
            upsample_factor=upsample).numpy()
        for bi in range(b):
            ours_v = np.sort(ours[bi][ours[bi] != 0])
            ref_v = np.sort(ref[bi][ref[bi] != 0])
            np.testing.assert_allclose(
                ours_v, ref_v, rtol=1e-6,
                err_msg=f"seed={seed} b={b} l={l} w={window} "
                        f"up={upsample} th={th}")


@pytest.mark.parametrize("seed", [13, 29, 47])
def test_toa_rmse_fuzz_matches_reference(seed):
    """Randomized ragged GT/est sets (zeros, NaN, Inf, duplicates, empty
    rows) through the tolerance matcher — all 7 metric columns must match
    the reference row for row."""
    from utils.metrics import toa_rmse as ref_toa

    from stofnet_tpu.train.metrics import toa_rmse as our_toa

    r = np.random.default_rng(seed)
    for _ in range(8):
        b = int(r.integers(1, 6))
        g = int(r.integers(1, 9))
        e = int(r.integers(1, 9))
        tol = float(r.choice([1.0, 9.0, 100.0, 1600.0]))
        gt = r.uniform(0, 500, (b, g)).astype(np.float32)
        es = r.uniform(0, 500, (b, e)).astype(np.float32)
        # inject invalids like real decoder output
        gt[r.random((b, g)) < 0.3] = 0.0
        es[r.random((b, e)) < 0.3] = 0.0
        if g > 1:
            gt[r.random((b, g)) < 0.1] = np.nan
        if e > 1:
            es[r.random((b, e)) < 0.1] = np.inf

        ours = np.asarray(our_toa(jnp.asarray(gt), jnp.asarray(es), tol=tol))
        ref = ref_toa(torch.from_numpy(gt.copy()),
                      torch.from_numpy(es.copy()), tol=tol).numpy()
        np.testing.assert_allclose(
            ours, ref, rtol=1e-5, atol=1e-5, equal_nan=True,
            err_msg=f"seed={seed} b={b} g={g} e={e} tol={tol}")


def test_mask2coords_single_channel_truncation_ref_crashes(rng):
    """Reference bug our decoder fixes (found by randomized differential
    fuzzing, r3): the reference's echo_max truncation calls
    get_amplitudes, which `squeeze()`s the channel dim
    (utils/mask2samples.py:137) — a SINGLE-channel item with more
    detections than echo_max therefore crashes upstream with a gather
    rank mismatch. Our static-slot decoder truncates fine; assert both
    behaviors so the divergence is on record (the reference driver never
    hits it because it decodes the whole batch as channels and omits
    echo_max at main.py:226)."""
    from utils.mask2samples import mask2coords as ref_mask2coords

    hm = make_heatmap(rng, b=1, l=256, peaks=8)
    ours = np.asarray(mask2coords(jnp.asarray(hm), window_size=7,
                                  threshold=0.5, upsample_factor=1,
                                  max_echoes=4))
    assert ours.shape == (1, 4)
    assert (ours > 0).sum() == 4  # truncated to the 4 strongest

    with pytest.raises(RuntimeError):
        ref_mask2coords(torch.from_numpy(hm[:, 0, :]), window_size=7,
                        threshold=0.5, upsample_factor=1, echo_max=4)


def test_mask2coords_ragged_truncation_phantom_amplitudes():
    """Second reference truncation bug found by the r3 differential fuzz:
    with RAGGED per-channel detection counts, the reference pads short
    channels' coord rows with zeros BEFORE amplitude ranking, and
    get_amplitudes then reads those padding slots' amplitudes from
    position 0 of the raw frame (utils/mask2samples.py:100-107,137). A
    large raw value at sample 0 gives every phantom slot that amplitude,
    and reduce_echoes evicts GENUINE echoes in its favor. Our static-slot
    decoder ranks by the actual suppressed scores with empty slots at
    -inf, so real detections always win. (The reference driver never
    passes echo_max at main.py:226/320, so its own benchmark avoids the
    path; any user who does hit it silently loses echoes.)"""
    from utils.mask2samples import mask2coords as ref_mask2coords

    L = 64
    x = np.zeros((2, L), np.float32)
    x[0, [10, 20, 30, 40]] = [1.5, 1.6, 1.7, 1.8]  # ragged-count driver
    x[1, 0] = 5.0   # phantom amplitude source (NMS-suppressed by 5.5)
    x[1, 1] = 5.5
    x[1, [10, 20]] = [1.2, 1.3]

    ref = ref_mask2coords(torch.from_numpy(x.copy()), 5, 1.0, 1,
                          echo_max=2).numpy()
    ours = np.asarray(mask2coords(jnp.asarray(x), window_size=5,
                                  threshold=1.0, upsample_factor=1,
                                  max_echoes=2))
    ref_ch1 = sorted(v for v in ref[1].tolist() if v > 0)
    ours_ch1 = sorted(v for v in ours[1].tolist() if v > 0)
    assert ours_ch1 == [1.0, 20.0]  # the two strongest GENUINE echoes
    assert ref_ch1 == [1.0]         # the reference evicted echo 20


def test_mask2coords_empty_detections_static_shape():
    """Reference quirk #3 (found by the r3 seed-4242 fuzz campaign): when
    NO maxima survive, the reference's early-out returns
    ``zeros((B, scores.shape[1], 1))`` — for its 2-D (B, L) input that is
    a rank-3 (B, L, 1) tensor with a bogus L-sized axis
    (/root/reference/utils/mask2samples.py:88-89), breaking the
    documented (B, E) 0=invalid layout every other code path produces.
    Our decoder is shape-stable: the same static (B, max_echoes) zeros
    as any other empty row."""
    from utils.mask2samples import mask2coords as ref_mask2coords

    heat = np.zeros((2, 1, 40), np.float32)  # nothing to detect
    ours = np.asarray(mask2coords(jnp.asarray(heat), window_size=9,
                                  threshold=None, upsample_factor=2,
                                  max_echoes=8))
    assert ours.shape == (2, 8) and not ours.any()

    ref = ref_mask2coords(torch.from_numpy(heat[:, 0, :]), window_size=9,
                          threshold=None, upsample_factor=2,
                          echo_max=8).numpy()
    assert ref.ndim == 3 and ref.shape == (2, 40, 1) and not ref.any()
