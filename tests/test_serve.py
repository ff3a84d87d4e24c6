"""AOT serving export (stofnet_tpu/serve.py + cli/export.py).

The torch reference serves eagerly from a live python process
(main.py:291-347); our serving contract is a serialized StableHLO
artifact with the weights baked in, runnable with no model code. These
tests pin: export→load round-trip equals the live pipeline bit-for-bit,
the artifact enforces its static input contract, multi-platform lowering
is recorded, and the CLI tool exports a reference checkpoint end to end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.serve import (export_pipeline, load_pipeline,
                               make_pipeline, save_pipeline)


@pytest.fixture(scope="module")
def small_ckpt():
    from stofnet_tpu.models import StofNet

    overrides = {"num_features": 16, "semi_global_scale": 8, "num_blocks": 4}
    model = StofNet(**overrides)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
    return variables, overrides


def test_export_roundtrip_matches_live_pipeline(small_ckpt, tmp_path):
    variables, overrides = small_ckpt
    blob = export_pipeline(variables, overrides, batch=3, length=800,
                           max_echoes=8)
    p = save_pipeline(tmp_path / "m.jaxexp", blob)

    served = load_pipeline(p)
    live = jax.jit(make_pipeline(variables, overrides, max_echoes=8))

    x = np.random.default_rng(0).standard_normal((3, 1, 800)).astype(
        np.float32)
    got = np.asarray(served(jnp.asarray(x)))
    want = np.asarray(live(jnp.asarray(x)))
    assert got.shape == (3, 8)
    np.testing.assert_array_equal(got, want)


def test_export_records_platforms_and_contract(small_ckpt, tmp_path):
    variables, overrides = small_ckpt
    blob = export_pipeline(variables, overrides, batch=2, length=800,
                           max_echoes=4, platforms=("cpu", "tpu"))
    p = save_pipeline(tmp_path / "m.jaxexp", blob)
    served = load_pipeline(p)
    assert tuple(served.platforms) == ("cpu", "tpu")
    (aval,) = served.in_avals
    assert aval.shape == (2, 1, 800) and aval.dtype == jnp.float32

    # the static contract is enforced: a wrong-shape call fails loudly
    with pytest.raises(Exception):
        np.asarray(served(jnp.zeros((2, 1, 400), jnp.float32)))


def test_cli_export_reference_checkpoint(tmp_path):
    """End to end on the shipped reference checkpoint: the artifact built
    by the CLI decodes a synthetic echo at the right coordinate."""
    from stofnet_tpu.cli.export import main as export_main

    out = tmp_path / "armadillo_b2.jaxexp"
    export_main([f"model_file=different-armadillo", f"out={out}",
                 "batch=2", "length=800", "max_echoes=4", "th=Null",
                 "platforms=cpu"])
    assert out.exists() and out.stat().st_size > 1e5  # weights baked in

    served = load_pipeline(out)
    t = np.arange(800, dtype=np.float32)
    x = np.zeros((2, 1, 800), np.float32)
    for b, p0 in enumerate((300.0, 500.0)):
        x[b, 0] = (np.exp(-0.5 * ((t - p0) / 12.0) ** 2)
                   * np.sin(2 * np.pi * t / 20.0))
    coords = np.asarray(served(jnp.asarray(x)))
    for b, p0 in enumerate((300.0, 500.0)):
        valid = coords[b][coords[b] > 0]
        assert valid.size, f"row {b}: no echo decoded"
        assert np.min(np.abs(valid - p0)) < 30.0, (
            f"row {b}: decoded {valid} vs expected ~{p0}")


def _echo_batch(L: int, positions=(300.0, 500.0)) -> np.ndarray:
    t = np.arange(L, dtype=np.float32)
    return np.stack([
        (np.exp(-0.5 * ((t - p0 * L / 800.0) / 12.0) ** 2)
         * np.sin(2 * np.pi * t / 20.0))[None]
        for p0 in positions]).astype(np.float32)


# (input length, registry.build_model kwargs) per family — the whole zoo
# behind the reference's one model= switch (main.py:133-167) exports.
# kuleshov: input_length = sample_num*rf_scale must equal L and be
# divisible by 2**num_layers; sincnet: the sinc filterbank needs fs;
# zonzini: 4 stride-4 stages need L >= ~700 (see the model's guard).
ZOO_EXPORT_CASES = {
    "edsr": (256, {}),
    "espcn": (256, {}),
    "unet": (256, {}),
    "kuleshov": (256, {"sample_num": 32, "rf_scale_factor": 8}),
    "sincnet": (1024, {"fs": 1e5}),
    "zonzini": (1024, {}),
    "gradpeak": (800, {}),
}


@pytest.mark.parametrize("name", sorted(ZOO_EXPORT_CASES))
def test_zoo_export_roundtrip(name, tmp_path):
    """Every registry model exports to a self-contained artifact that
    equals the live pipeline bit-for-bit; output stays coords-shaped
    (heatmap decode / zonzini one-slot ToA / gradpeak echo table)."""
    from stofnet_tpu.models.registry import build_model

    L, kw = ZOO_EXPORT_CASES[name]
    overrides = {"dataset_kind": "chirp", "upsample_factor": 4,
                 "rf_scale_factor": 10, **kw}
    model, _ = build_model(name, th=None, dtype=jnp.bfloat16, **overrides)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, L)))

    blob = export_pipeline(variables, overrides, batch=2, length=L,
                           max_echoes=8, model_name=name)
    served = load_pipeline(save_pipeline(tmp_path / f"{name}.jaxexp", blob))
    live = jax.jit(make_pipeline(variables, overrides, model_name=name,
                                 max_echoes=8))

    x = _echo_batch(L)
    got = np.asarray(served(jnp.asarray(x)))
    want = np.asarray(live(jnp.asarray(x)))
    # zonzini: one direct-ToA slot; gradpeak on chirp: echo_max=1 pruning
    # (the registry's protocol value, main.py:164); heatmap: max_echoes
    assert got.shape == (2, 1 if name in ("zonzini", "gradpeak") else 8)
    np.testing.assert_array_equal(got, want)


def test_cli_export_zoo_model(tmp_path):
    """cli.export model=espcn end to end on a random-init checkpoint saved
    through the orbax path; and the family-specific knob validation is
    loud (kuleshov without sample_num, sincnet without fs, int8 on a
    non-stofnet model)."""
    from stofnet_tpu.cli.export import main as export_main
    from stofnet_tpu.models.registry import build_model
    from stofnet_tpu.train.checkpoint import save_checkpoint

    model, _ = build_model("espcn", upsample_factor=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 256)))
    ckpt = tmp_path / "espcn_ckpt"
    save_checkpoint(ckpt, {"variables": variables})

    out = tmp_path / "espcn.jaxexp"
    export_main([f"model_file={ckpt}", f"out={out}", "model=espcn",
                 "batch=2", "length=256", "max_echoes=4", "th=Null",
                 "platforms=cpu"])
    served = load_pipeline(out)
    assert np.asarray(served(jnp.asarray(_echo_batch(256)))).shape == (2, 4)

    with pytest.raises(SystemExit, match="sample_num"):
        export_main(["model=kuleshov", "model_file=x", "length=256"])
    with pytest.raises(SystemExit, match="fs"):
        export_main(["model=sincnet", "model_file=x", "length=256"])
    with pytest.raises(SystemExit, match="stofnet only"):
        export_main(["model=espcn", "model_file=x", "int8_calib=c.npy"])


def test_dtype_export_knob(small_ckpt, tmp_path):
    """dtype=float32 exports an f32-forward artifact (bit-exact vs the
    live f32 pipeline); needed for saturating activations — ESPCN's
    sigmoid emits exact-1.0 argmax ties across hundreds of bins in bf16
    on echo input (measured cross-backend decode disagreement on
    hardware), unique max in f32. Bad values are refused."""
    import jax.numpy as jnp2

    from stofnet_tpu.cli.export import main as export_main

    variables, overrides = small_ckpt
    out = tmp_path / "f32.jaxexp"
    export_main(["model_file=different-armadillo", f"out={out}",
                 "dtype=float32", "batch=2", "length=800", "max_echoes=4",
                 "th=Null", "platforms=cpu"])
    served = load_pipeline(out)

    from stofnet_tpu.cli.export import resolve_variables_and_overrides

    v, ov = resolve_variables_and_overrides(
        {"model_file": "different-armadillo"})
    live = jax.jit(make_pipeline(v, ov, max_echoes=4, dtype=jnp2.float32))
    x = _echo_batch(800)
    np.testing.assert_array_equal(np.asarray(served(jnp.asarray(x))),
                                  np.asarray(live(jnp.asarray(x))))

    with pytest.raises(SystemExit, match="dtype"):
        export_main(["model_file=x", "dtype=float16"])


def test_dtype_auto_gate(tmp_path, capfd):
    """dtype=auto (the default) self-checks bf16 decode agreement on
    in-distribution echoes (serve.probe_dtype_agreement) and falls back
    to f32 when it misses the 0.99 bar. Measured CPU probe values this
    gate encodes: stofnet/armadillo 0.996-0.999 (bf16 ships), EDSR 1.0,
    vital-puddle ESPCN 0.0000 (the hardware saturation trap,
    docs/ZOO_SERVE_tpu.md), zonzini 0.19 (bf16's 8-bit mantissa
    quantizes a direct-regression ToA head to ~16-32-sample steps at
    ToA >= 2048 — f32 is genuinely safer there, a second trap class the
    gate catches)."""
    from stofnet_tpu.cli.export import apply_dtype_gate, main as export_main
    from stofnet_tpu.cli.export import (resolve_variables_and_overrides,
                                        resolve_zoo_variables_and_overrides)
    from stofnet_tpu.serve import probe_dtype_agreement

    # pass path: the flagship trained checkpoint clears the gate
    v, ov = resolve_variables_and_overrides(
        {"model_file": "different-armadillo"})
    assert probe_dtype_agreement(v, ov, length=800) >= 0.99
    assert apply_dtype_gate("auto", v, ov, model_name="stofnet",
                            length=800) is None  # bf16 default
    assert "bf16 OK" in capfd.readouterr().err

    # fire path, real trap: vital-puddle ESPCN's sigmoid saturates in
    # bf16 (exact-1.0 argmax ties) — the probe sees it on CPU with no
    # device, and the CLI exports f32 (bit-equal to the f32 pipeline)
    zv, zov = resolve_zoo_variables_and_overrides(
        {"model_file": "vital-puddle", "dataset_kind": "chirp"}, "espcn")
    assert probe_dtype_agreement(zv, zov, length=8000,
                                 model_name="espcn") < 0.99
    assert apply_dtype_gate("auto", zv, zov, model_name="espcn",
                            length=8000) == jnp.float32
    assert "dtype gate FIRED" in capfd.readouterr().err

    # explicit dtype skips the probe entirely
    assert apply_dtype_gate(jnp.bfloat16, zv, zov, model_name="espcn",
                            length=8000) == jnp.bfloat16
    assert capfd.readouterr().err == ""

    # end to end through the CLI: an auto export of the espcn checkpoint
    # equals the explicit-f32 export bit for bit
    out_auto = tmp_path / "espcn_auto.jaxexp"
    export_main(["model_file=vital-puddle", f"out={out_auto}",
                 "model=espcn", "batch=2", "length=8000", "max_echoes=4",
                 "th=Null", "platforms=cpu"])
    assert "dtype gate FIRED" in capfd.readouterr().err
    served = load_pipeline(out_auto)
    live = jax.jit(make_pipeline(zv, zov, model_name="espcn", max_echoes=4,
                                 dtype=jnp.float32))
    x = _echo_batch(8000)
    np.testing.assert_array_equal(np.asarray(served(jnp.asarray(x))),
                                  np.asarray(live(jnp.asarray(x))))


def test_unet_export_nondefault_depth(tmp_path):
    """n_layers= must size the CONSTRUCTED WaveUnet, not just the .pth
    import rewrite — a 4-layer checkpoint exports with n_layers=4 even
    though dataset_kind=chirp defaults the depth to 2 (regression: the
    knob used to be import-only, so this died with a param-shape
    mismatch at trace)."""
    from stofnet_tpu.cli.export import main as export_main
    from stofnet_tpu.models.registry import build_model
    from stofnet_tpu.train.checkpoint import save_checkpoint

    L = 1024
    model, _ = build_model("unet", n_layers=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, L)))
    ckpt = tmp_path / "unet4_ckpt"
    save_checkpoint(ckpt, {"variables": variables})

    out = tmp_path / "unet4.jaxexp"
    # dtype pinned: this test asserts bit-equality vs the bf16 live
    # pipeline; the auto gate could legitimately pick f32 on random init
    export_main([f"model_file={ckpt}", f"out={out}", "model=unet",
                 "n_layers=4", "batch=2", f"length={L}", "max_echoes=4",
                 "th=Null", "platforms=cpu", "dtype=bfloat16"])
    served = load_pipeline(out)
    live = jax.jit(make_pipeline(
        variables, {"dataset_kind": "chirp", "upsample_factor": 4,
                    "rf_scale_factor": 10, "n_layers": 4},
        model_name="unet", max_echoes=4))
    x = _echo_batch(L)
    np.testing.assert_array_equal(np.asarray(served(jnp.asarray(x))),
                                  np.asarray(live(jnp.asarray(x))))


def test_build_closes_hosts_on_failure(tmp_path):
    """A failure AFTER some hosts are built (second artifact missing)
    must not leak dispatcher threads into the embedding process."""
    import threading

    from stofnet_tpu.cli.serve import build
    from stofnet_tpu.models import StofNet

    overrides = {"num_features": 16, "semi_global_scale": 8,
                 "num_blocks": 4}
    model = StofNet(**overrides)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
    blob = export_pipeline(variables, overrides, batch="b", length=800,
                           platforms=("cpu",))
    art = save_pipeline(tmp_path / "a.jaxexp", blob)

    before = {t.name for t in threading.enumerate()
              if "serving-dispatch" in t.name}
    with pytest.raises(Exception):
        build({"artifact": f"{art},{tmp_path / 'missing.jaxexp'}",
               "max_batch": 4})
    import time as _time

    deadline = _time.monotonic() + 10.0
    while _time.monotonic() < deadline:
        after = {t.name for t in threading.enumerate()
                 if "serving-dispatch" in t.name}
        if after == before:
            break
        _time.sleep(0.05)
    assert after == before, f"leaked dispatcher threads: {after - before}"


def test_gradpeak_export_needs_no_checkpoint(tmp_path):
    """model=gradpeak is parameter-free: the CLI exports it without
    model_file, and the artifact detects a synthetic echo onset."""
    from stofnet_tpu.cli.export import main as export_main

    out = tmp_path / "gradpeak.jaxexp"
    # th=1e-5 = the reference's gradpeak benchmark threshold
    # (bash_scripts/array_pala_params.txt:7); the auto-threshold heuristic
    # (std**16*1.2e13) is knife-edge on short synthetic frames
    export_main([f"out={out}", "model=gradpeak", "batch=2", "length=800",
                 "max_echoes=8", "th=1e-5", "platforms=cpu"])
    served = load_pipeline(out)
    coords = np.asarray(served(jnp.asarray(_echo_batch(800))))
    # dataset_kind=chirp default → echo_max=1 pruning (main.py:164):
    # one onset slot per frame
    assert coords.shape == (2, 1)
    for b, p0 in enumerate((300.0, 500.0)):
        valid = coords[b][coords[b] > 0]
        assert valid.size, f"row {b}: no echo detected"
        assert np.min(np.abs(valid - p0)) < 60.0, (
            f"row {b}: detected {valid} vs expected ~{p0}")


def test_cli_serve_zoo_from_checkpoint(tmp_path):
    """cli.serve serves the zoo straight from a checkpoint (model= +
    family knobs, same switch as the exporter): an espcn orbax ckpt and
    the parameter-free gradpeak both answer over TCP."""
    from stofnet_tpu.cli.serve import build
    from stofnet_tpu.models.registry import build_model
    from stofnet_tpu.serving import ServingClient
    from stofnet_tpu.train.checkpoint import save_checkpoint

    model, _ = build_model("espcn", upsample_factor=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 256)))
    ckpt = tmp_path / "espcn_ckpt"
    save_checkpoint(ckpt, {"variables": variables})

    for args, L in (({"model": "espcn", "model_file": str(ckpt),
                      "length": 256, "max_echoes": 4}, 256),
                    ({"model": "gradpeak", "length": 800, "th": 1e-5}, 800)):
        host, server, port = build({**args, "max_batch": 4,
                                    "warmup": False})
        try:
            with ServingClient(("127.0.0.1", port)) as cli:
                out = cli.infer(_echo_batch(L)[0, 0])
                assert out.ndim == 1 and out.size >= 1
        finally:
            server.shutdown()
            server.server_close()
            host.close()


def test_host_serves_regression_artifact(tmp_path):
    """The dynamic-batching host is output-shape-agnostic: a zonzini
    artifact (one ToA slot per frame) fans out through the same
    submit/result path as coords, bit-exact vs the direct call."""
    from stofnet_tpu.models.registry import build_model
    from stofnet_tpu.serving import ServingHost

    L = 1024
    overrides = {"dataset_kind": "chirp"}
    model, _ = build_model("zonzini", dtype=jnp.bfloat16, **overrides)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, L)))
    blob = export_pipeline(variables, overrides, batch="b", length=L,
                           model_name="zonzini")
    served = load_pipeline(save_pipeline(tmp_path / "z.jaxexp", blob))

    host = ServingHost(served, length=L, max_batch=4)
    try:
        x = _echo_batch(L, positions=(300.0, 500.0, 650.0))
        futs = [host.submit(x[i, 0]) for i in range(3)]
        got = np.stack([f.result(timeout=60.0) for f in futs])
        want = np.asarray(served(jnp.asarray(x)))
        np.testing.assert_array_equal(got, want)
    finally:
        host.close()


def test_weightless_export_roundtrip(small_ckpt, tmp_path):
    """bake_weights=False (weights-as-inputs export): the body carries
    program text only (smaller than the baked artifact), the params ride
    a .weights.npz sidecar load_pipeline auto-detects, coords equal the
    baked export bit for bit, in_avals stays the waveform contract (the
    daemon reads it), and the host serves it unchanged. Exists for large
    models whose baked body floors the artifact (kuleshov 163 MB at
    L=800, relay 413s ~290 MB bodies — docs/ZOO_SERVE_tpu.md)."""
    from stofnet_tpu.serve import export_pipeline_weightless
    from stofnet_tpu.serving import ServingHost

    variables, overrides = small_ckpt
    baked = export_pipeline(variables, overrides, batch="b", length=800,
                            max_echoes=4, platforms=("cpu",))
    blob, weights = export_pipeline_weightless(
        variables, overrides, batch="b", length=800, max_echoes=4,
        platforms=("cpu",))
    assert len(blob) < len(baked)
    out = tmp_path / "wl.jaxexp"
    save_pipeline(out, blob, weights=weights)
    assert (tmp_path / "wl.jaxexp.weights.npz").exists()

    served = load_pipeline(out)
    (aval,) = served.in_avals  # waveform contract alone, not the tree
    assert aval.shape[1:] == (1, 800)
    served_baked = load_pipeline(save_pipeline(tmp_path / "baked.jaxexp",
                                               baked))
    x = _echo_batch(800)
    np.testing.assert_array_equal(np.asarray(served(jnp.asarray(x))),
                                  np.asarray(served_baked(jnp.asarray(x))))

    with ServingHost(served, length=800, max_batch=4) as host:
        got = host.submit(x[0, 0]).result(timeout=60.0)
        np.testing.assert_array_equal(
            got, np.asarray(served(jnp.asarray(x[:1])))[0])

    # int8 exports keep baking by design (quantized state, not a params
    # tree)
    with pytest.raises(ValueError, match="int8"):
        export_pipeline_weightless(
            variables, overrides, batch=1, length=800,
            int8_calib=np.zeros((1, 1, 800), np.float32))


def test_cli_weightless_export(tmp_path):
    """cli.export bake_weights=False end to end on the reference
    checkpoint: sidecar written, artifact equals the baked CLI export."""
    from stofnet_tpu.cli.export import main as export_main

    outs = {}
    for name, extra in (("baked", []), ("wl", ["bake_weights=False"])):
        out = tmp_path / f"{name}.jaxexp"
        export_main([f"model_file=different-armadillo", f"out={out}",
                     "batch=2", "length=800", "max_echoes=4", "th=Null",
                     "platforms=cpu", "dtype=bfloat16", *extra])
        outs[name] = out
    assert (tmp_path / "wl.jaxexp.weights.npz").exists()
    assert (outs["wl"].stat().st_size < outs["baked"].stat().st_size)
    x = jnp.asarray(_echo_batch(800))
    np.testing.assert_array_equal(
        np.asarray(load_pipeline(outs["wl"])(x)),
        np.asarray(load_pipeline(outs["baked"])(x)))


def test_int8_export_roundtrip(small_ckpt, tmp_path):
    """int8_calib switches the exported forward to the quantized SGB
    path; the artifact equals the live int8 pipeline bit-for-bit and
    decodes the synthetic echo where the f32 export does."""
    variables, overrides = small_ckpt
    t = np.arange(800, dtype=np.float32)
    calib = np.stack([
        (np.exp(-0.5 * ((t - p0) / 12.0) ** 2)
         * np.sin(2 * np.pi * t / 20.0))[None]
        for p0 in (150.0, 300.0, 450.0, 600.0)]).astype(np.float32)

    blob = export_pipeline(variables, overrides, batch=2, length=800,
                           max_echoes=4, int8_calib=calib)
    served = load_pipeline(save_pipeline(tmp_path / "q.jaxexp", blob))
    live = jax.jit(make_pipeline(variables, overrides, max_echoes=4,
                                 int8_calib=calib))
    x = calib[:2]
    np.testing.assert_array_equal(np.asarray(served(jnp.asarray(x))),
                                  np.asarray(live(jnp.asarray(x))))


def test_exported_artifact_serves_on_dp_mesh(small_ckpt, tmp_path):
    """The artifact is a jax-traceable callable: jit it over a dp mesh and
    GSPMD shards the baked program like any function — multi-chip serving
    straight from the export, identical to single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stofnet_tpu.parallel import make_mesh

    variables, overrides = small_ckpt
    blob = export_pipeline(variables, overrides, batch=8, length=800,
                           max_echoes=4)
    served = load_pipeline(save_pipeline(tmp_path / "m.jaxexp", blob))
    x = np.random.default_rng(0).standard_normal((8, 1, 800)).astype(
        np.float32)
    single = np.asarray(served(jnp.asarray(x)))

    mesh = make_mesh(dp=8, sp=1)
    sh = NamedSharding(mesh, P("dp"))
    sharded = np.asarray(jax.jit(lambda xx: served(xx), in_shardings=(sh,))(
        jax.device_put(jnp.asarray(x), sh)))
    np.testing.assert_array_equal(single, sharded)


def test_batch_polymorphic_export(small_ckpt, tmp_path):
    """batch="b" exports ONE artifact that serves every batch size
    (jax.export shape polymorphism); decoded coords bit-exact vs the
    direct pipeline at each size, and the CLI accepts batch=b."""
    variables, overrides = small_ckpt
    blob = export_pipeline(variables, overrides, batch="b", length=800,
                           max_echoes=8)
    served = load_pipeline(save_pipeline(tmp_path / "poly.jaxexp", blob))
    live = jax.jit(make_pipeline(variables, overrides, max_echoes=8))

    rng = np.random.default_rng(0)
    for b in (1, 2, 5):
        x = rng.standard_normal((b, 1, 800)).astype(np.float32)
        got = np.asarray(served(jnp.asarray(x)))
        want = np.asarray(live(jnp.asarray(x)))
        assert got.shape == (b, 8)
        np.testing.assert_array_equal(got, want)

    # symbolic batch survives the CLI's batch= parsing too
    from stofnet_tpu.cli import export as export_cli

    args = export_cli.parse_args(["batch=b", "model_file=x"])
    assert args["batch"] == "b"

    # int8-SGB composes with the symbolic batch: per-WAVEFORM activation
    # scales are row-local by design (decode independent of batch
    # composition), which is exactly what batch polymorphism needs
    calib = rng.standard_normal((4, 1, 800)).astype(np.float32)
    blob8 = export_pipeline(variables, overrides, batch="b", length=800,
                            max_echoes=8, int8_calib=calib)
    served8 = load_pipeline(save_pipeline(tmp_path / "pi8.jaxexp", blob8))
    live8 = jax.jit(make_pipeline(variables, overrides, max_echoes=8,
                                  int8_calib=calib))
    for b in (1, 5):
        x = rng.standard_normal((b, 1, 800)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(served8(jnp.asarray(x))),
                                      np.asarray(live8(jnp.asarray(x))))


def test_int8_stack_export_roundtrip(small_ckpt, tmp_path):
    """Partial-stack int8 serving config (int8_stack_layers + eq_alpha +
    bias_correct, serve.make_pipeline): the exported artifact equals the
    live partial-stack pipeline bit-for-bit, and the config actually
    changes the program (differs from the SGB-only int8 export on the
    same calibration)."""
    variables, overrides = small_ckpt
    t = np.arange(800, dtype=np.float32)
    calib = np.stack([
        (np.exp(-0.5 * ((t - p0) / 12.0) ** 2)
         * np.sin(2 * np.pi * t / 20.0))[None]
        for p0 in (150.0, 300.0, 450.0, 600.0)]).astype(np.float32)

    kw = dict(max_echoes=4, int8_calib=calib, int8_stack_layers=(2, 3),
              int8_eq_alpha=0.5, int8_bias_correct=True)
    blob = export_pipeline(variables, overrides, batch=2, length=800, **kw)
    served = load_pipeline(save_pipeline(tmp_path / "qs.jaxexp", blob))
    live = jax.jit(make_pipeline(variables, overrides, **kw))
    x = calib[:2]
    np.testing.assert_array_equal(np.asarray(served(jnp.asarray(x))),
                                  np.asarray(live(jnp.asarray(x))))

    # the stack config changes the PROGRAM, not just the result: its
    # quantized state carries the s8 stack twins the SGB-only build lacks
    from stofnet_tpu.models.int8 import quantize_stofnet
    qkw = {k: int(v) for k, v in overrides.items()
           if k in ("upsample_factor", "num_blocks", "semi_global_scale")}
    q = quantize_stofnet(variables, jnp.asarray(calib), stack_layers=(2, 3),
                         eq_alpha=0.5, bias_correct=True, **qkw)
    assert set(q["stack"]) == {"conv2", "conv3"}
    q0 = quantize_stofnet(variables, jnp.asarray(calib), **qkw)
    assert "stack" not in q0


def test_load_stack_cfg_parsing():
    """cli/export.load_stack_cfg: comma-string and YAML-list forms parse
    to the same tuple, alpha/bc coerce, and a stack without a calibration
    batch is refused loudly."""
    from stofnet_tpu.cli.export import load_stack_cfg

    got = load_stack_cfg({"int8_stack": "4,8,10", "int8_calib": "x.npy",
                          "int8_eq_alpha": 0.5, "int8_bias_correct": True})
    assert got == {"int8_stack_layers": (4, 8, 10), "int8_eq_alpha": 0.5,
                   "int8_bias_correct": True}
    got = load_stack_cfg({"int8_stack": [4, 8, 10], "int8_calib": "x.npy"})
    assert got["int8_stack_layers"] == (4, 8, 10)
    assert got["int8_eq_alpha"] is None and not got["int8_bias_correct"]
    assert load_stack_cfg({})["int8_stack_layers"] is None
    with pytest.raises(SystemExit, match="int8_calib"):
        load_stack_cfg({"int8_stack": "4"})


def test_serve_compile_cache_persists_bucket_compiles(small_ckpt, tmp_path):
    """compile_cache=DIR on the daemon CLI writes persistent XLA cache
    entries during bucket warmup (daemon restarts then skip the
    per-bucket relay compiles — docs/SERVE_DAEMON_tpu.md's cold start)."""
    import os

    from stofnet_tpu.cli.serve import build
    from stofnet_tpu.serve import export_pipeline, save_pipeline

    variables, overrides = small_ckpt
    blob = export_pipeline(variables, overrides, batch="b", length=800,
                           max_echoes=8)
    art = save_pipeline(tmp_path / "cc.jaxexp", blob)
    cache_dir = tmp_path / "xla_cache"
    prev = jax.config.jax_compilation_cache_dir
    try:
        host, server, _ = build({"artifact": str(art), "max_batch": 4,
                                 "compile_cache": str(cache_dir)})
        server.shutdown()
        server.server_close()
        host.close()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
    entries = [f for _, _, fs in os.walk(cache_dir) for f in fs]
    assert entries, "warmup wrote no persistent-cache entries"


def test_espcn_f32_decode_is_knife_edge_on_saturation_ties(tmp_path):
    """Pin the MECHANISM behind espcn's sub-0.99 hardware agreement
    (docs/ESPCN_DIAG_tpu.md, VERDICT r4 #5): vital-puddle ESPCN's
    sigmoid saturates to EXACT ties at the top of the f32 heatmap on
    in-distribution echoes, so the th=Null per-row-max decode
    (ops/peaks.threshold_scores falsy mode, reference
    utils/mask2samples.py:19-22) is an index-order lottery — ANY
    platform-level ulp difference may flip it, with no numeric fault.

    Two assertions, both CPU-deterministic:
    1. exact top-2 ties exist (margin == 0 on a nontrivial fraction of
       rows) — the ill-posedness is in the model output itself;
    2. a 1-ulp-scale input perturbation only ever flips rows whose
       unperturbed top-2 margin is knife-edge thin — well-separated
       rows decode identically, i.e. disagreement measures tie-breaking,
       not localization error.
    """
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.cli.export import resolve_zoo_variables_and_overrides
    from stofnet_tpu.data.synthetic import gate_batch
    from stofnet_tpu.models.registry import build_model
    from stofnet_tpu.ops.peaks import nms1d

    args = {"model_file": "vital-puddle",
            "ckpt_dir": "/root/reference/ckpts", "dataset_kind": "chirp"}
    variables, overrides = resolve_zoo_variables_and_overrides(args, "espcn")
    model, _ = build_model("espcn", dtype=jnp.float32, **{
        k: v for k, v in overrides.items()
        if k in ("dataset_kind", "upsample_factor", "rf_scale_factor")})
    pipe = jax.jit(make_pipeline(variables, overrides, model_name="espcn",
                                 dtype=jnp.float32, threshold=None,
                                 max_echoes=8, window_size=20))

    B, L = 12, 8000
    x = np.asarray(gate_batch(B, L, np.random.default_rng(3008)),
                   np.float32)
    heat = np.asarray(jax.jit(lambda x: model.apply(
        variables, x).astype(jnp.float32).squeeze(1))(jnp.asarray(x)))
    sup = np.asarray(nms1d(jnp.asarray(heat), 20))
    part = np.partition(sup, -2, axis=-1)
    top = np.maximum(np.max(heat, axis=-1), 1e-30)
    margin = (part[:, -1] - part[:, -2]) / top

    # 1. exact saturation ties exist in f32 (the measured bf16 trap's
    #    f32 shadow): at least one row with margin EXACTLY zero
    assert np.min(margin) == 0.0, (
        f"expected exact top-2 ties in the f32 heatmap, margins {margin}")

    # 2. knife-edge-only flips: perturb the input by ~1 ulp relative
    coords = np.asarray(pipe(jnp.asarray(x)))
    coords_p = np.asarray(pipe(jnp.asarray(x * (1.0 + 1e-7))))
    flipped = np.unique(np.nonzero(
        np.abs(coords - coords_p) > 1.0)[0])  # rows with any flip
    for r in np.asarray(flipped):
        assert margin[r] < 1e-5, (
            f"row {r} flipped under a 1-ulp perturbation but its top-2 "
            f"margin {margin[r]:.3e} is NOT knife-edge — a real "
            f"sensitivity, investigate")
