"""Data layer: transforms distributions, synthetic dataset round-trip,
ChirpDataset contract, loader/split behavior."""

import numpy as np
import pytest

from stofnet_tpu.data import (
    NormalizeVol,
    AddNoise,
    CropChannelData,
    ChirpDataset,
    DataLoader,
    split_dataset,
    generate_chirp_dataset,
)
from stofnet_tpu.data.transforms import Compose


@pytest.fixture(scope="module")
def chirp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("chirp") / "stof_chirp101_dataset"
    return generate_chirp_dataset(root)


def test_normalize_vol(rng):
    w = rng.standard_normal(100) * 7
    out, gt = NormalizeVol()(w, 5.0)
    assert np.abs(out).max() == pytest.approx(1.0)
    assert gt == 5.0


def test_add_noise_snr(rng):
    w = np.sin(np.linspace(0, 40 * np.pi, 4000))
    snr = 20.0
    out, _ = AddNoise(snr, rng=rng)(w, None)
    noise = out - w
    measured = 10 * np.log10(np.sum(w ** 2) / np.sum(noise ** 2))
    assert measured == pytest.approx(snr, abs=0.5)


def test_add_noise_envelope_positive_mean(rng):
    w = np.abs(np.sin(np.linspace(0, 10, 500))) + 0.1
    out, _ = AddNoise(30, rng=rng)(w, None)
    assert out.shape == w.shape


def test_crop_channel_data(rng):
    w = np.zeros(1000)
    gt = 430.0
    w[int(gt)] = 1.0
    for _ in range(10):
        out, new_gt = CropChannelData(ratio=0.75, rng=rng)(w.copy(), gt)
        assert out.shape == w.shape  # padded back to original length
        k = int(round(new_gt))
        assert out[k] == 1.0  # GT index still points at the spike


def test_synthetic_dataset_contract(chirp_root):
    ds = ChirpDataset(chirp_root, split_dirname="test", rf_scale_factor=10)
    assert len(ds) == 2 * 4  # classes x positions x n_test_per_pos
    assert ds.get_channel_num() == 1
    assert ds.get_sample_num() == 800

    env, rf, rf_gt, gt_sample, gt_pos, label = ds[0]
    assert rf.shape == (8000,)
    assert env.shape == (8000,)
    assert 0 < gt_sample < 8000
    assert label in ("cuboid", "cylinder")

    # GT sample index must match the planted echo's envelope peak closely
    peak = np.abs(rf_gt := np.asarray(rf_gt)).argmax()
    assert abs(peak - gt_sample) < 40


def test_transforms_in_dataset(chirp_root, rng):
    tf = Compose([NormalizeVol(), CropChannelData(ratio=0.75, rng=rng),
                  AddNoise(30, rng=rng)])
    ds = ChirpDataset(chirp_root, split_dirname="train", rf_scale_factor=10,
                      transforms=tf)
    env, rf, rf_gt, gt_sample, _, _ = ds[0]
    assert rf.shape == (8000,)
    assert np.isfinite(rf).all()
    assert 0 < gt_sample < 8000


def test_split_and_loader(chirp_root):
    ds = ChirpDataset(chirp_root, split_dirname="train", rf_scale_factor=4)
    train_idx, val_idx = split_dataset(len(ds), 0.2, seed=3008)
    assert len(train_idx) + len(val_idx) == len(ds)
    assert set(train_idx) & set(val_idx) == set()

    dl = DataLoader(ds, train_idx, batch_size=4, shuffle=True, seed=1)
    batch = next(iter(dl))
    env, rf, rf_gt, gt_sample, gt_pos, labels = batch
    assert rf.shape == (4, 3200)
    assert gt_sample.shape == (4,)
    assert isinstance(labels, list) and len(labels) == 4

    # drop_last semantics
    dl2 = DataLoader(ds, batch_size=5, drop_last=True)
    assert len(dl2) == len(ds) // 5


def test_threaded_loader_matches_serial(chirp_root):
    """num_workers>0 pipelines item loads but yields identical batches in
    identical order (the reference's DataLoader(num_workers=4) analogue)."""
    ds = ChirpDataset(chirp_root, split_dirname="train", rf_scale_factor=4)
    serial = DataLoader(ds, batch_size=3, shuffle=True, seed=7)
    threaded = DataLoader(ds, batch_size=3, shuffle=True, seed=7,
                          num_workers=4, prefetch_batches=2)
    got_s = list(serial)
    got_t = list(threaded)
    assert len(got_s) == len(got_t)
    for bs, bt in zip(got_s, got_t):
        np.testing.assert_array_equal(bs[1], bt[1])
        np.testing.assert_array_equal(bs[3], bt[3])
        assert bs[5] == bt[5]


def test_pipeline_batches_pairs_host_device(chirp_root):
    import jax.numpy as jnp

    from stofnet_tpu.data.loader import pipeline_batches

    ds = ChirpDataset(chirp_root, split_dirname="test", rf_scale_factor=4)
    dl = DataLoader(ds, batch_size=2)

    def host_iter():
        for batch in dl:
            yield batch[1], batch[3]

    n = 0
    for (rf, gt), (rf_d, gt_d) in pipeline_batches(
            host_iter(), lambda b: tuple(jnp.asarray(x) for x in b)):
        n += 1
        np.testing.assert_array_equal(np.asarray(rf_d), rf)
        np.testing.assert_array_equal(np.asarray(gt_d), gt)
    assert n == len(dl)


def test_augmentation_rng_thread_safe(chirp_root):
    """Randomized transforms draw from a per-item generator, so concurrent
    __getitem__ (thread-pool loader) cannot race a shared Generator, and a
    fixed (seed, idx, draw#) tuple reproduces the augmentation."""
    from stofnet_tpu.data.transforms import (
        AddNoise, Compose, CropChannelData, NormalizeVol,
    )

    tf = Compose([NormalizeVol(), CropChannelData(ratio=0.75),
                  AddNoise(snr=30)])
    ds1 = ChirpDataset(chirp_root, split_dirname="train", rf_scale_factor=4,
                       transforms=tf, seed=5)
    ds2 = ChirpDataset(chirp_root, split_dirname="train", rf_scale_factor=4,
                       transforms=tf, seed=5)
    # same (seed, idx, draw#) -> identical augmented items even though the
    # transform objects are shared across dataset instances
    a = ds1[0]
    b = ds2[0]
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(np.float32(a[3]), np.float32(b[3]))
    # second draw of the same item differs (epoch-varying augmentation)
    c = ds1[0]
    assert not np.array_equal(a[1], c[1])


def test_pipeline_batches_empty():
    from stofnet_tpu.data.loader import pipeline_batches

    assert list(pipeline_batches(iter(()), lambda b: b)) == []


def test_threaded_loader_empty_and_single(chirp_root):
    ds = ChirpDataset(chirp_root, split_dirname="test", rf_scale_factor=4)
    dl = DataLoader(ds, indices=[], batch_size=2, num_workers=2)
    assert list(dl) == []
    dl1 = DataLoader(ds, indices=[0], batch_size=2, num_workers=2)
    batches = list(dl1)
    assert len(batches) == 1 and batches[0][1].shape[0] == 1


def test_prefetch_to_device(chirp_root):
    from stofnet_tpu.data.loader import prefetch_to_device

    ds = ChirpDataset(chirp_root, split_dirname="test", rf_scale_factor=4)
    dl = DataLoader(ds, batch_size=2)
    n = 0
    for batch in prefetch_to_device(dl):
        n += 1
        assert batch[1].shape[0] <= 2
    assert n == len(dl)


def test_augmentation_rng_order_independent(chirp_root):
    """Item idx's n-th draw seeds (seed, idx, n) regardless of the order in
    which OTHER items were served (thread scheduling under num_workers>0
    must not change the augmentation stream — regression for the global
    draw counter that did)."""
    from stofnet_tpu.data.transforms import (
        AddNoise, Compose, CropChannelData, NormalizeVol,
    )

    tf = Compose([NormalizeVol(), CropChannelData(ratio=0.75),
                  AddNoise(snr=30)])
    ds1 = ChirpDataset(chirp_root, split_dirname="train", rf_scale_factor=4,
                       transforms=tf, seed=5)
    ds2 = ChirpDataset(chirp_root, split_dirname="train", rf_scale_factor=4,
                       transforms=tf, seed=5)
    n = len(ds1)
    ordered = [ds1[i] for i in range(n)]
    shuffled = [ds2[i] for i in reversed(range(n))][::-1]
    for a, b in zip(ordered, shuffled):
        np.testing.assert_array_equal(a[1], b[1])

    # threaded loader WITH transforms matches the serial loader exactly
    serial = DataLoader(ds1, batch_size=3, shuffle=True, seed=7)
    threaded = DataLoader(ds2, batch_size=3, shuffle=True, seed=7,
                          num_workers=4, prefetch_batches=2)
    # both datasets have served one full epoch above, so draw counters align
    for bs, bt in zip(list(serial), list(threaded)):
        np.testing.assert_array_equal(bs[1], bt[1])


def test_loader_set_epoch_order_is_resumable():
    """Epoch e's shuffle order is a pure function of (seed, e): a loader
    'resumed' straight into epoch 2 yields the same batches as one that
    iterated epochs 0-1 first."""

    class Tiny:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.asarray([i], dtype=np.float32),)

    def epoch_order(dl):
        return [int(b[0][j, 0]) for b in dl for j in range(b[0].shape[0])]

    a = DataLoader(Tiny(), batch_size=2, shuffle=True, seed=3)
    b = DataLoader(Tiny(), batch_size=2, shuffle=True, seed=3)
    for e in range(3):
        a.set_epoch(e)
        order_a = epoch_order(a)
    b.set_epoch(2)  # resume directly at epoch 2
    assert epoch_order(b) == order_a
    a.set_epoch(0)
    assert epoch_order(a) != order_a  # epochs really do differ


def test_crop_ratio_none_sticks_to_first_draw(rng):
    """CropChannelData(ratio=None): one draw sticks for every item
    (reference utils/transforms.py:62). Drawn at CONSTRUCTION from the
    dataset rng so the run-wide width does not depend on which worker
    thread's item happens to run first (reproducibility under
    num_workers>0)."""
    from stofnet_tpu.data.transforms import CropChannelData

    tf = CropChannelData(ratio=None, rng=np.random.default_rng(0))
    first = tf.ratio
    assert first is not None and 0 <= first < 1
    wf = rng.standard_normal(400).astype(np.float32)
    tf(wf, 200.0, rng=np.random.default_rng(7))  # per-item rng can't redraw
    assert tf.ratio == first
    # deterministic: same construction seed -> same sticky width
    assert CropChannelData(ratio=None,
                           rng=np.random.default_rng(0)).ratio == first


def test_config_interpolation_lazy_and_typed(tmp_path):
    """OmegaConf-equivalent ${} semantics: CLI overrides of a referenced
    key propagate into dependents, whole-value interpolation keeps the
    native type, chains resolve fully."""
    from stofnet_tpu.utils.config import load_config, merge_cli

    p = tmp_path / "c.yaml"
    p.write_text(
        "data_path: base/\n"
        "ubx_dir: /mnt/${data_path}\n"
        "data_dir: ${ubx_dir}\n"
        "rf_scale_factor: 10\n"
        "factor: ${rf_scale_factor}\n"
    )
    cfg = load_config(p)
    assert cfg.data_dir == "/mnt/base/"
    assert cfg.factor == 10 and isinstance(cfg.factor, int)

    cfg = merge_cli(cfg, ["data_path=other/", "rf_scale_factor=20"])
    assert cfg.data_dir == "/mnt/other/"  # override propagated
    assert cfg.factor == 20


def test_config_post_load_mutation_survives_merge_cli(tmp_path):
    """Programmatic mutations after load_config (attr, item, and update)
    must not be silently reverted to YAML values by a later merge_cli
    re-resolve — only keys the CLI actually overrode may change."""
    from stofnet_tpu.utils.config import load_config, merge_cli

    p = tmp_path / "c.yaml"
    p.write_text("th: 0.1\nmodel: stofnet\nepochs: 5\nlr: 1.0\n")
    cfg = load_config(p)
    cfg.th = 0.5                 # attr assignment
    cfg["epochs"] = 9            # item assignment
    cfg.update(lr=2.0)           # dict-style update
    cfg = merge_cli(cfg, ["model=edsr"])
    assert cfg.th == 0.5 and cfg.epochs == 9 and cfg.lr == 2.0
    assert cfg.model == "edsr"   # the CLI override still wins
    # and the CLI keeps highest precedence over an earlier mutation
    cfg2 = load_config(p)
    cfg2.th = 0.5
    assert merge_cli(cfg2, ["th=0.9"]).th == 0.9


def test_pala_temporal_filter_drops_zero_frame(tmp_path):
    """Slow-time high-pass must not emit an all-zero first frame (0/0 NaN
    through NormalizeVol)."""
    from stofnet_tpu.data.pala import PalaDatasetRf, generate_pala_dataset
    from stofnet_tpu.data.transforms import Compose, NormalizeVol

    root = generate_pala_dataset(tmp_path / "p", n_sequences=1, n_frames=4)
    ds = PalaDatasetRf(root, sequences=[0], temporal_filter_opt=True,
                       transforms=Compose([NormalizeVol()]))
    assert len(ds) == 3  # first frame dropped
    for i in range(len(ds)):
        assert np.isfinite(ds[i][0]).all()


def test_pala_rescale_grid_maps_gt_exactly(tmp_path):
    """Raw index i maps exactly to upscaled index i*r so the waveform and
    _gt_samples agree (no linspace-endpoint skew growing with depth)."""
    from stofnet_tpu.data.pala import PalaDatasetRf, generate_pala_dataset

    root = generate_pala_dataset(tmp_path / "p", n_sequences=1, n_frames=2,
                                 n_targets=1, n_channels=8, n_samples=256)
    r = 4
    raw = PalaDatasetRf(root, sequences=[0], rescale_factor=1)
    up = PalaDatasetRf(root, sequences=[0], rescale_factor=r)
    f_raw, f_up = raw[0][0], up[0][0]
    # the upscaled waveform at index i*r equals the raw waveform at i
    np.testing.assert_allclose(f_up[..., ::r], f_raw, rtol=1e-5, atol=1e-6)
    # and GT scales exactly by r
    np.testing.assert_allclose(up[0][2], raw[0][2] * r, rtol=1e-6)


def test_chirp_rf_gt_crops_around_original_gt(chirp_root):
    """rf_gt is cropped around the ORIGINAL GT index like the reference's
    [gt_sample]*3 (chirp_dataset.py:124-126), not the already-shifted one —
    the GT echo must remain inside the rf_gt window."""
    from stofnet_tpu.data.transforms import Compose, CropChannelData, NormalizeVol

    ds = ChirpDataset(chirp_root, split_dirname="train", rf_scale_factor=4,
                      transforms=Compose([NormalizeVol(),
                                          CropChannelData(ratio=0.5)]),
                      seed=1)
    _, rf, rf_gt, gt_sample, _, _ = ds[0]
    # the cropped rf_gt must carry signal energy (the echo), not just the
    # zero padding a start-anchored crop would capture
    assert np.abs(rf_gt).max() > 0.1 * np.abs(rf).max()


def test_add_noise_formula_golden_vs_reference(rng):
    """Exact same-noise golden for the AddNoise SNR formula on the 1-D
    items chirp transforms actually receive (chirp_dataset.py:126): with
    an identical noise realization, the reference's snr_noise and ours
    agree to machine precision — for 1-D, python's builtin sum (the
    reference normalizer) equals our global np.sum. Rank-2 inputs would
    diverge (builtin sum collapses axis 0 only), but that branch is only
    reachable through the lost PALA submodule's unknown item rank
    (transforms.py docstring)."""
    from tests import reference

    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    from utils.transforms import AddNoise as RefAddNoise

    for snr, bipolar in ((30.0, True), (15.0, False)):
        w = rng.standard_normal(256) if bipolar else np.abs(
            rng.standard_normal(256)) + 0.1

        np.random.seed(20260818)
        ref_out = RefAddNoise(snr=snr)(w)

        class _Replay:
            """Feed our transform the reference's exact legacy draw."""

            def __init__(self):
                np.random.seed(20260818)

            def random(self, shape):
                return np.random.rand(*shape)

        ours_out, _ = AddNoise(snr)(w, None, rng=_Replay())
        np.testing.assert_allclose(ours_out, np.asarray(ref_out),
                                   rtol=1e-12)


def test_crop_channel_data_replay_golden_vs_reference(rng):
    """Exact same-draw golden for CropChannelData: with an identical shift
    draw, the crop window arithmetic (width rounding, edge clamping,
    max_dist shift bounds, zero-pad tail, GT re-indexing) matches the
    reference element for element. Also pins the reference's edge CRASH:
    at max_dist <= 1 its np.random.randint(lo, hi) gets lo == hi and
    raises (utils/transforms.py:80); ours takes the only legal shift."""
    from tests import reference

    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    from utils.transforms import CropChannelData as RefCrop

    class _Replay:
        def __init__(self, seed):
            self.seed = seed
            np.random.seed(seed)

        def integers(self, lo, hi):
            return np.random.randint(lo, hi)

    for trial in range(8):
        size = int(rng.integers(60, 400))
        ratio = float(rng.uniform(0.2, 0.9))
        gt = float(rng.uniform(5, size - 5))
        w = rng.standard_normal(size)

        np.random.seed(1000 + trial)
        ref_out, ref_gt = RefCrop(ratio=ratio)(w.copy(), gt)[:2]

        ours_out, ours_gt = CropChannelData(ratio=ratio)(
            w.copy(), gt, rng=_Replay(1000 + trial))
        np.testing.assert_array_equal(ours_out, np.asarray(ref_out))
        assert float(ours_gt) == pytest.approx(float(ref_gt))

    # the reference's lo==hi crash, and our graceful equivalent: gt at the
    # very start makes the window hug the edge (max_dist small)
    w = rng.standard_normal(200)
    np.random.seed(0)
    with pytest.raises(ValueError):
        RefCrop(ratio=0.5)(w.copy(), 0.0)
    out, g = CropChannelData(ratio=0.5)(w.copy(), 0.0,
                                        rng=np.random.default_rng(0))
    assert out.shape == w.shape and np.isfinite(g)


def test_reference_add_noise_rank2_quirk_is_real():
    """Evidence for the transforms.py divergence note: on a RANK-2 input
    the reference's builtin-sum SNR normalizer is per-sample-position
    (axis-0 collapse only), so its per-position noise/signal power ratio
    is ~constant — NOT a global SNR. Only reachable through the lost PALA
    submodule's unknown item rank; our global-sum transform implements a
    true SNR (test_add_noise_snr)."""
    from tests import reference

    if not reference.available():
        pytest.skip("reference unavailable")
    reference.add_to_path()
    from utils.transforms import AddNoise as RefAddNoise

    rng = np.random.default_rng(3)
    w = rng.standard_normal((4, 512)) * np.linspace(
        0.1, 10.0, 512)  # strongly position-dependent power
    np.random.seed(7)
    out = np.asarray(RefAddNoise(snr=20)(w.copy()))
    noise = out - w
    per_pos = (noise ** 2).sum(0) / (w ** 2).sum(0)
    # per-position ratio ~10^(-snr/10) everywhere (position-local
    # normalization), despite the 100x power gradient across positions
    assert np.all(np.abs(10 * np.log10(per_pos) + 20) < 3.0), (
        10 * np.log10(per_pos)[:5])
