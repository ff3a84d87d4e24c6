"""Compact input codecs (serving/codecs.py), the SFN2 wires built on
them (serving/tcp.py wires 3-4), and encoded-INPUT artifacts
(serve.py ``input_enc=``).

No reference equivalent (/root/reference/main.py serves nothing over a
wire); these pin the r5 serving levers: the daemon→device leg ships
codes instead of f32 (the measured serving ceiling,
docs/SERVE_BATCHED_tpu.md) and the client wire gains ≥0.99-capable
compact schemes (s16, per-chunk s8 — scripts/input_enc_sweep.py).
The invariants:

- numpy codec round trips have the scheme's error bound, handle dead
  rows/chunks, and are idempotent (re-encoding a decode is lossless);
- the TCP wire payloads are bit-identical to the codecs;
- the jnp dequant inside an encoded-input pipeline bit-matches the
  numpy decode, so artifact and wire agree to the last ulp;
- encoded-input exports keep the f(x f32)→coords serving contract via
  load_pipeline's host-side encode, compose with weightless export and
  batch polymorphism, and serve through ServingHost and the dp mesh.
"""

import socket
import struct

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.serve import (encoded_input_specs, export_pipeline,
                               export_pipeline_weightless, load_pipeline,
                               make_input_encoder, make_pipeline,
                               parse_input_enc, save_pipeline)
from stofnet_tpu.serving import (ServingClient, ServingHost, decode_payload,
                                 encode_rows, start_server)
from stofnet_tpu.serving.codecs import (chunk_len, decode_s8c, decode_s16,
                                        encode_s8c, encode_s16)
from stofnet_tpu.serving.tcp import (WIRE_INT8C, WIRE_INT16, parse_wire,
                                     payload_nbytes)

LENGTH = 256


@pytest.fixture(scope="module")
def small_ckpt():
    from stofnet_tpu.models import StofNet

    overrides = {"num_features": 16, "semi_global_scale": 8, "num_blocks": 4}
    model = StofNet(**overrides)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 800)))
    return variables, overrides


def _rows(k=5, length=LENGTH, seed=11):
    rng = np.random.default_rng(seed)
    rows = (rng.standard_normal((k, length)) *
            10.0 ** rng.integers(-3, 4, (k, 1))).astype(np.float32)
    rows[k // 2] = 0.0  # dead row: scale guard
    return rows


def test_codec_roundtrip_properties():
    rows = _rows()
    # s16: error <= scale/2, dead rows exact, idempotent
    codes, scales = encode_s16(rows)
    assert codes.dtype == np.int16 and scales.dtype == np.float32
    back = decode_s16(codes, scales)
    step = np.max(np.abs(rows), axis=-1, keepdims=True) / 32767.0
    assert np.all(np.abs(back - rows) <= step / 2 + 1e-12)
    np.testing.assert_array_equal(back[2], 0.0)
    c2, s2 = encode_s16(back)
    np.testing.assert_array_equal(c2, codes)
    np.testing.assert_array_equal(s2, scales)

    # s8c: per-CHUNK error bound (strictly finer than the per-row bound
    # wherever a chunk is quieter than the row max), dead chunks exact,
    # idempotent
    n = 8
    codes, scales = encode_s8c(rows, n)
    assert codes.shape == rows.shape and scales.shape == (rows.shape[0], n)
    back = decode_s8c(codes, scales)
    c = chunk_len(LENGTH, n)
    chunk_amax = np.max(np.abs(rows.reshape(-1, n, c)), axis=-1)
    bound = np.repeat(chunk_amax / 127.0, c, axis=-1).reshape(rows.shape)
    assert np.all(np.abs(back - rows) <= bound / 2 + 1e-12)
    np.testing.assert_array_equal(back[2], 0.0)
    c2, s2 = encode_s8c(back, n)
    np.testing.assert_array_equal(c2, codes)
    np.testing.assert_array_equal(s2, scales)

    with pytest.raises(ValueError, match="must divide"):
        encode_s8c(rows, 7)  # 7 does not divide 256


def test_new_wires_match_codecs():
    rows = _rows()
    k = rows.shape[0]

    w, p = parse_wire("int16")
    assert (w, p) == (WIRE_INT16, 0)
    payload = encode_rows(rows, w, p)
    assert len(payload) == payload_nbytes(w, k, LENGTH, p) \
        == k * (4 + 2 * LENGTH)
    codes, scales = encode_s16(rows)
    np.testing.assert_array_equal(decode_payload(payload, w, k, LENGTH, p),
                                  decode_s16(codes, scales)[:, None])

    w, p = parse_wire("s8c8")
    assert (w, p) == (WIRE_INT8C, 8)
    payload = encode_rows(rows, w, p)
    assert len(payload) == payload_nbytes(w, k, LENGTH, p) \
        == k * (4 * 8 + LENGTH)
    codes, scales = encode_s8c(rows, 8)
    np.testing.assert_array_equal(decode_payload(payload, w, k, LENGTH, p),
                                  decode_s8c(codes, scales)[:, None])

    # default chunk count and error spellings
    from stofnet_tpu.serving.tcp import DEFAULT_CHUNKS

    assert parse_wire("s8c") == (WIRE_INT8C, DEFAULT_CHUNKS)
    with pytest.raises(ValueError, match="wire must be"):
        parse_wire("s7c")
    with pytest.raises(ValueError, match="chunk count"):
        parse_wire("s8c0")


def test_parse_input_enc_and_specs():
    assert parse_input_enc(None) == ("f32", 0)
    assert parse_input_enc("bf16") == ("bf16", 0)
    assert parse_input_enc("int16") == ("s16", 0)
    assert parse_input_enc("s8c32") == ("s8c", 32)
    with pytest.raises(ValueError, match="input_enc"):
        parse_input_enc("u8")

    (codes, scales) = encoded_input_specs("s8c8", 4, LENGTH)
    assert codes.shape == (4, 1, LENGTH) and codes.dtype == jnp.int8
    assert scales.shape == (4, 1, 8) and scales.dtype == jnp.float32
    (codes, scales) = encoded_input_specs("s16", 4, LENGTH)
    assert codes.dtype == jnp.int16 and scales.shape == (4, 1, 1)
    (wave,) = encoded_input_specs("bf16", 4, LENGTH)
    assert wave.dtype == jnp.bfloat16
    with pytest.raises(ValueError, match="must divide"):
        encoded_input_specs("s8c7", 4, LENGTH)


@pytest.mark.parametrize("enc", ["s16", "s8c8"])
def test_enc_pipeline_matches_numpy_decode(small_ckpt, enc):
    """The jnp dequant inside make_pipeline(input_enc=...) bit-matches
    the numpy codec decode: enc_pipe(encode(x)) == base_pipe(decode(
    encode(x))) exactly — so wire decode and on-device dequant can never
    disagree."""
    variables, overrides = small_ckpt
    base = jax.jit(make_pipeline(variables, overrides, max_echoes=8))
    enc_pipe = jax.jit(make_pipeline(variables, overrides, max_echoes=8,
                                     input_enc=enc))
    encoder = make_input_encoder(enc)

    x = _rows(4, 800, seed=3)[:, None]
    args = encoder(x)
    got = np.asarray(enc_pipe(*[jnp.asarray(a) for a in args]))
    if enc == "s16":
        decoded = decode_s16(args[0][:, 0], args[1][:, 0, 0])[:, None]
    else:
        decoded = decode_s8c(args[0][:, 0], args[1][:, 0])[:, None]
    want = np.asarray(base(jnp.asarray(decoded)))
    np.testing.assert_array_equal(got, want)


def test_encoded_input_export_roundtrip(small_ckpt, tmp_path):
    variables, overrides = small_ckpt
    blob = export_pipeline(variables, overrides, batch=3, length=800,
                           max_echoes=8, input_enc="s8c8")
    p = save_pipeline(tmp_path / "enc.jaxexp", blob)
    served = load_pipeline(p)
    assert served.input_enc == "s8c8"
    (aval,) = served.in_avals
    assert aval.shape == (3, 1, 800) and aval.dtype == jnp.int8
    assert [a.dtype for a in served.raw_in_avals] == [jnp.int8, jnp.float32]

    live = jax.jit(make_pipeline(variables, overrides, max_echoes=8,
                                 input_enc="s8c8"))
    x = _rows(3, 800, seed=5)[:, None]
    got = np.asarray(served(x))
    want = np.asarray(live(*[jnp.asarray(a)
                             for a in make_input_encoder("s8c8")(x)]))
    np.testing.assert_array_equal(got, want)


def test_encoded_bf16_export_lossless_vs_f32_artifact(small_ckpt, tmp_path):
    """input_enc=bf16 halves the host→device bytes and is LOSSLESS for
    the (default) bf16-forward pipeline: its coords equal the plain f32
    artifact's bit for bit (the model's own first-op cast absorbs it)."""
    variables, overrides = small_ckpt
    f32 = save_pipeline(tmp_path / "f32.jaxexp", export_pipeline(
        variables, overrides, batch=2, length=800, max_echoes=8))
    b16 = save_pipeline(tmp_path / "b16.jaxexp", export_pipeline(
        variables, overrides, batch=2, length=800, max_echoes=8,
        input_enc="bf16"))
    served_f32, served_b16 = load_pipeline(f32), load_pipeline(b16)
    assert served_b16.input_enc == "bf16"
    assert served_b16.in_avals[0].dtype == jnp.bfloat16
    x = _rows(2, 800, seed=7)[:, None]
    np.testing.assert_array_equal(np.asarray(served_b16(x)),
                                  np.asarray(served_f32(x)))


def test_weightless_encoded_export_composes(small_ckpt, tmp_path):
    variables, overrides = small_ckpt
    blob, weights = export_pipeline_weightless(
        variables, overrides, batch=2, length=800, max_echoes=8,
        input_enc="s16")
    p = save_pipeline(tmp_path / "wl.jaxexp", blob, weights=weights)
    served = load_pipeline(p)
    assert served.input_enc == "s16"
    (aval,) = served.in_avals
    assert aval.shape == (2, 1, 800) and aval.dtype == jnp.int16

    live = jax.jit(make_pipeline(variables, overrides, max_echoes=8,
                                 input_enc="s16"))
    x = _rows(2, 800, seed=9)[:, None]
    want = np.asarray(live(*[jnp.asarray(a)
                             for a in make_input_encoder("s16")(x)]))
    np.testing.assert_array_equal(np.asarray(served(x)), want)


def test_batch_polymorphic_encoded_export(small_ckpt, tmp_path):
    variables, overrides = small_ckpt
    blob = export_pipeline(variables, overrides, batch="b", length=800,
                           max_echoes=8, input_enc="s8c8")
    p = save_pipeline(tmp_path / "poly.jaxexp", blob)
    served = load_pipeline(p)
    assert served.input_enc == "s8c8"
    for k in (1, 3):
        out = np.asarray(served(_rows(k, 800, seed=k)[:, None]))
        assert out.shape == (k, 8)


def test_host_serves_encoded_artifact(small_ckpt, tmp_path):
    """ServingHost zero-pads f32 rows and the load_pipeline shim encodes
    per batch — padding must stay invisible (the encoders are row-local
    by construction, like every pipeline stage)."""
    variables, overrides = small_ckpt
    p = save_pipeline(tmp_path / "enc.jaxexp", export_pipeline(
        variables, overrides, batch="b", length=800, max_echoes=8,
        input_enc="s8c8"))
    served = load_pipeline(p)
    x = _rows(3, 800, seed=13)
    direct = np.asarray(served(x[:, None]))
    with ServingHost(served, 800, max_batch=4) as host:
        np.testing.assert_array_equal(host.infer(x), direct)
        np.testing.assert_array_equal(host.infer(x[1]), direct[1])


def test_encoded_artifact_serves_on_dp_mesh(small_ckpt, tmp_path):
    """cli/serve.py mesh=True with an encoded-input artifact: the codes
    and scales shard over dp (host-side encode stays outside the traced
    function) and coords equal the single-device artifact's exactly."""
    from stofnet_tpu.cli.serve import build

    variables, overrides = small_ckpt
    p = save_pipeline(tmp_path / "enc.jaxexp", export_pipeline(
        variables, overrides, batch="b", length=800, max_echoes=8,
        input_enc="s8c8"))
    want = np.asarray(load_pipeline(p)(_rows(6, 800, seed=17)[:, None]))

    host, server, port = build({"artifact": str(p), "mesh": True,
                                "mesh_dp": 2, "max_batch": 8,
                                "warmup": False})
    try:
        with ServingClient(("127.0.0.1", port)) as c:
            got = c.infer(_rows(6, 800, seed=17))
        np.testing.assert_array_equal(got, want)
    finally:
        server.shutdown()
        server.server_close()
        host.close()


class _EchoPipeline:
    """Returns the first 4 samples of each row — a transparent double so
    wire tests can predict the exact response."""

    def __call__(self, x):
        return np.asarray(x)[:, 0, :4]


def test_new_wires_over_tcp():
    pipe = _EchoPipeline()
    x = _rows(3, LENGTH, seed=19)
    with ServingHost(pipe, LENGTH, max_batch=4) as host:
        server, _, port = start_server(host)
        try:
            for wire_name in ("int16", "s8c8"):
                w, prm = parse_wire(wire_name)
                with ServingClient(("127.0.0.1", port),
                                   wire=wire_name) as c:
                    got = c.infer(x)
                want = decode_payload(encode_rows(x, w, prm), w, 3, LENGTH,
                                      prm)[:, 0, :4]
                np.testing.assert_array_equal(got, want)

            # an invalid s8c chunk count (0, or one that does not divide
            # L) is rejected BEFORE the payload read — this also keeps
            # the _MAX_SAMPLES byte bound (a hostile param could
            # otherwise inflate payload_nbytes far past it). The
            # connection drops after the in-band error (framing is
            # unknowable without a trusted payload length).
            for bad_param in (0, 7):
                with socket.create_connection(("127.0.0.1", port),
                                              timeout=30.0) as s:
                    s.sendall(b"SFN2" + struct.pack(
                        "<BBII", WIRE_INT8C, bad_param, 1, LENGTH))
                    status, m = struct.unpack(
                        "<iI", s.recv(8, socket.MSG_WAITALL))
                    assert status == 1
                    assert b"chunk count" in s.recv(m, socket.MSG_WAITALL)

            # a fresh connection still serves a valid s8c request
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=30.0) as s:
                w, prm = parse_wire("s8c8")
                s.sendall(b"SFN2" + struct.pack("<BBII", w, prm, 1, LENGTH)
                          + encode_rows(x[:1], w, prm))
                status, m = struct.unpack("<iI", s.recv(8,
                                                        socket.MSG_WAITALL))
                assert status == 0 and m == 4
        finally:
            server.shutdown()
            server.server_close()


def test_codec_wire_fuzz():
    """Property fuzz across random shapes/magnitudes (finite data — the
    wire contract): every wire's encode→decode round trip stays within
    its scheme's error bound, payload sizes match payload_nbytes, and
    the codecs' decode is bit-identical to the wire's."""
    rng = np.random.default_rng(20260820)
    for trial in range(60):
        k = int(rng.integers(1, 9))
        n = int(rng.integers(1, 17))
        c = int(rng.integers(1, 65))
        length = n * c
        rows = (rng.standard_normal((k, length)) *
                10.0 ** rng.integers(-6, 7, (k, 1))).astype(np.float32)
        if trial % 3 == 0:
            rows[rng.integers(0, k)] = 0.0
        for wire_name in ("f32", "bf16", "int8", "int16", f"s8c{n}"):
            w, p = parse_wire(wire_name)
            payload = encode_rows(rows, w, p)
            assert len(payload) == payload_nbytes(w, k, length, p)
            back = decode_payload(payload, w, k, length, p)[:, 0]
            assert back.dtype == np.float32 and back.shape == rows.shape
            if wire_name == "f32":
                np.testing.assert_array_equal(back, rows)
            elif wire_name == "bf16":
                import jax.numpy as jnp

                np.testing.assert_array_equal(
                    back, np.asarray(jnp.asarray(rows).astype(jnp.bfloat16),
                                     np.float32))
            elif wire_name in ("int8", "int16"):
                top = 127.0 if wire_name == "int8" else 32767.0
                step = np.max(np.abs(rows), axis=-1, keepdims=True) / top
                assert np.all(np.abs(back - rows) <= step / 2
                              + 1e-6 * np.abs(rows) + 1e-30)
            else:
                amax = np.max(np.abs(rows.reshape(k, n, c)), -1,
                              keepdims=True)
                bound = np.broadcast_to(amax / 127.0, (k, n, c)).reshape(
                    rows.shape)
                assert np.all(np.abs(back - rows) <= bound / 2
                              + 1e-6 * np.abs(rows) + 1e-30)


def test_zoo_family_encoded_export(tmp_path):
    """input_enc composes with the zoo's model= switch too (the wrap
    sits outside the family branch in make_pipeline): an EDSR artifact
    with an s16 device signature equals the s16 live pipeline."""
    import flax.linen  # noqa: F401 — ensure flax present before registry
    from stofnet_tpu.models.registry import build_model

    model, _ = build_model("edsr", upsample_factor=4)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, 256)))
    overrides = {"dataset_kind": "chirp", "upsample_factor": 4,
                 "rf_scale_factor": 10}
    blob = export_pipeline(variables, overrides, batch=2, length=256,
                           model_name="edsr", max_echoes=4,
                           input_enc="s16")
    p = save_pipeline(tmp_path / "edsr_s16.jaxexp", blob)
    served = load_pipeline(p)
    assert served.input_enc == "s16"

    live = jax.jit(make_pipeline(variables, overrides, model_name="edsr",
                                 max_echoes=4, input_enc="s16"))
    x = _rows(2, 256, seed=21)[:, None]
    want = np.asarray(live(*[jnp.asarray(a)
                             for a in make_input_encoder("s16")(x)]))
    np.testing.assert_array_equal(np.asarray(served(x)), want)
