"""Native C++ fastloader: correctness vs np.loadtxt and throughput sanity."""

import time

import numpy as np
import pytest

from stofnet_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("no C++ toolchain / prebuilt library")
    return True


def test_loadtxt_single_column(lib_ok, tmp_path, rng):
    data = rng.standard_normal(1000)
    p = tmp_path / "one.txt"
    np.savetxt(p, data)
    out = native.loadtxt(p)
    ref = np.loadtxt(p)
    np.testing.assert_allclose(out, ref, rtol=0, atol=0)


def test_loadtxt_two_columns(lib_ok, tmp_path, rng):
    data = rng.standard_normal((500, 2))
    p = tmp_path / "two.txt"
    np.savetxt(p, data)
    out = native.loadtxt(p)
    ref = np.loadtxt(p)
    assert out.shape == ref.shape == (500, 2)
    np.testing.assert_array_equal(out, ref)


def test_loadtxt_csv(lib_ok, tmp_path):
    p = tmp_path / "pos.csv"
    p.write_text("0,25.5\n1,50.25\n2,-75.125\n")
    out = native.loadtxt(p)
    np.testing.assert_array_equal(
        out, [[0.0, 25.5], [1.0, 50.25], [2.0, -75.125]])


def test_loadtxt_scientific(lib_ok, tmp_path):
    p = tmp_path / "sci.txt"
    p.write_text("1e-5 -2.5E+3\n+3.25e0 4\n")
    out = native.loadtxt(p)
    np.testing.assert_array_equal(out, [[1e-5, -2.5e3], [3.25, 4.0]])


def test_loadtxt_missing_file(lib_ok, tmp_path):
    with pytest.raises(FileNotFoundError):
        native.loadtxt(tmp_path / "nope.txt")


def test_faster_than_numpy(lib_ok, tmp_path, rng):
    data = rng.standard_normal((8000, 2))
    p = tmp_path / "big.txt"
    np.savetxt(p, data)

    def best_of(fn, n=5):
        fn()  # warm page cache / library state
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = best_of(lambda: native.loadtxt(p))
    t_numpy = best_of(lambda: np.loadtxt(p))
    assert t_native < t_numpy, (t_native, t_numpy)


def test_dataset_uses_fastloader(lib_ok, tmp_path):
    from stofnet_tpu.data.synthetic import generate_chirp_dataset
    from stofnet_tpu.data.chirp import ChirpDataset

    root = generate_chirp_dataset(tmp_path / "chirp", n_positions=2,
                                  n_train_per_pos=1, n_test_per_pos=1,
                                  sample_num=200)
    ds = ChirpDataset(root, "test", rf_scale_factor=2)
    env, rf, rf_gt, gt, pos, label = ds[0]
    assert rf.shape == (400,)
    assert np.isfinite(rf).all()


def test_loadtxt_comments_and_commas(tmp_path):
    """'#' comments are skipped (np.loadtxt semantics) and comma files
    parse, in BOTH the C fast path and the python fallback."""
    from stofnet_tpu.native import _py_loadtxt, loadtxt

    p = tmp_path / "d.txt"
    p.write_text("# header with numbers 16000 2\n1.5, 2.5\n3.5, 4.5  # tail\n")
    for fn in (loadtxt, _py_loadtxt):
        arr = fn(p)
        np.testing.assert_allclose(arr, [[1.5, 2.5], [3.5, 4.5]])

    q = tmp_path / "single_row.txt"
    q.write_text("1.0 2.0 3.0\n")
    for fn in (loadtxt, _py_loadtxt):
        arr = fn(q)
        assert arr.shape == (1, 3)


def test_loadtxt_corrupt_token_fails_loudly(tmp_path):
    """A non-numeric token must raise a ValueError naming the file and
    token — silently dropping it would shift every later value (ADVICE r2).
    Both the C fast path (returns -2 -> python re-parse) and the pure
    fallback must agree."""
    import pytest

    from stofnet_tpu import native

    bad = tmp_path / "bad.txt"
    bad.write_text("1.0 2.0\n3.0 oops\n")
    with pytest.raises(ValueError, match="oops"):
        native.loadtxt(bad)
    with pytest.raises(ValueError, match="line 2"):
        native._py_loadtxt(bad)

    # '1_0' parses as 10.0 under python float() but is corrupt data —
    # both paths must refuse it (code-review finding r3)
    und = tmp_path / "und.txt"
    und.write_text("1_0 2.0\n")
    with pytest.raises(ValueError, match="1_0"):
        native.loadtxt(und)

    ok = tmp_path / "ok.txt"
    ok.write_text("# header\n1.0, 2.0\n-3.5e1, .25\n")
    got = native.loadtxt(ok)
    np.testing.assert_allclose(got, [[1.0, 2.0], [-35.0, 0.25]])
    np.testing.assert_allclose(native._py_loadtxt(ok), got)

    # a UTF-8 BOM is not corruption (Windows editors write one), and
    # nan/inf are values (np.loadtxt semantics), in both paths
    bom = tmp_path / "bom.txt"
    bom.write_bytes(b"\xef\xbb\xbf1.0 2.0\nnan inf\n")
    got = native.loadtxt(bom)
    assert got.shape == (2, 2) and got[0, 0] == 1.0
    assert np.isnan(got[1, 0]) and np.isinf(got[1, 1])
    got_py = native._py_loadtxt(bom)
    assert np.isnan(got_py[1, 0]) and np.isinf(got_py[1, 1])
