"""Serving runtime (stofnet_tpu/serving/): dynamic batch coalescing.

No reference equivalent (the torch reference evaluates fixed datasets in
process, main.py:291-347); these tests pin OUR serving contract:

- results through the host are BIT-EXACT vs calling the pipeline
  directly on each request alone (padding/coalescing is invisible —
  every pipeline stage is row-local);
- batches the device sees are always bucket-shaped (static shapes: the
  XLA compile count stays bounded at log2(max_batch)+1);
- coalescing actually happens (many queued singles → few device calls);
- shape errors fail at submit, pipeline errors fan out to the affected
  Futures without killing the host, close() drains;
- the TCP front round-trips the same numbers across processes' worth of
  sockets, reusing connections, and reports errors in-band.
"""

import threading
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stofnet_tpu.serving import (ServingClient, ServingHost, batch_buckets,
                                 start_server)

LENGTH, ECHOES = 800, 8


@pytest.fixture(scope="module")
def live_pipeline():
    """A small real StofNet serving pipeline (same config as
    tests/test_serve.py) — the integration half of the suite."""
    from stofnet_tpu.models import StofNet
    from stofnet_tpu.serve import make_pipeline

    overrides = {"num_features": 16, "semi_global_scale": 8, "num_blocks": 4}
    model = StofNet(**overrides)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, LENGTH)))
    return jax.jit(make_pipeline(variables, overrides, max_echoes=ECHOES))


class RecordingPipeline:
    """Test double: records the batch shapes the 'device' sees; output
    row i = (i-th row's first ECHOES samples) so slicing is checkable."""

    def __init__(self, gate: threading.Event = None, fail_on=None):
        self.shapes = []
        self.calls = 0
        self.gate = gate
        self.fail_on = fail_on  # batch size that raises

    def __call__(self, x):
        self.calls += 1
        self.shapes.append(x.shape)
        if self.gate is not None and self.calls == 1:
            self.gate.wait(10.0)
        if self.fail_on is not None and x.shape[0] == self.fail_on:
            raise RuntimeError("injected device fault")
        return np.asarray(x)[:, 0, :ECHOES]


def test_length_router_routes_and_rejects():
    """LengthRouter: requests route to the host whose static length
    matches x.shape[-1]; an unserved length raises naming the served set
    (submit-time, not in the Future); stats aggregate across lengths;
    close closes every host."""
    from stofnet_tpu.serving import LengthRouter

    pipes = {400: RecordingPipeline(), 800: RecordingPipeline()}
    hosts = {length: ServingHost(p, length, max_batch=4)
             for length, p in pipes.items()}
    router = LengthRouter(hosts)
    assert router.lengths == (400, 800)

    rng = np.random.default_rng(0)
    for length in (400, 800, 400):
        x = rng.standard_normal(length).astype(np.float32)
        got = router.infer(x, timeout=30.0)
        np.testing.assert_array_equal(got, x[:ECHOES])
    assert pipes[400].calls == 2 and pipes[800].calls == 1
    assert all(s[-1] == 400 for s in pipes[400].shapes)

    with pytest.raises(ValueError, match=r"600.*\(400, 800\)"):
        router.submit(np.zeros(600, np.float32))

    s = router.stats()
    assert s["requests"] == 3 and s["waveforms"] == 3
    assert set(s["per_length"]) == {400, 800}

    router.close()
    with pytest.raises(RuntimeError):
        hosts[400].submit(np.zeros(400, np.float32))

    # constructor validation: key must match the host's own length
    h = ServingHost(RecordingPipeline(), 400, max_batch=2)
    try:
        with pytest.raises(ValueError, match="router key"):
            LengthRouter({800: h})
    finally:
        h.close()


def test_cli_serve_multi_length_artifacts(tmp_path):
    """cli.serve artifact=a,b serves TWO lengths from one port: the same
    connection round-trips both, each bit-exact vs its artifact called
    directly; an unserved length reports in-band and the connection
    keeps working; duplicate lengths are refused at build."""
    from stofnet_tpu.cli.serve import build
    from stofnet_tpu.models import StofNet
    from stofnet_tpu.serve import (export_pipeline, load_pipeline,
                                   make_pipeline, save_pipeline)

    overrides = {"num_features": 16, "semi_global_scale": 8, "num_blocks": 4}
    model = StofNet(**overrides)
    arts = {}
    for L in (400, 800):
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, L)))
        blob = export_pipeline(variables, overrides, batch="b", length=L,
                               max_echoes=ECHOES, platforms=("cpu",))
        arts[L] = save_pipeline(tmp_path / f"l{L}.jaxexp", blob)

    host, server, port = build(
        {"artifact": f"{arts[400]},{arts[800]}", "max_batch": 4})
    try:
        assert host.lengths == (400, 800)
        rng = np.random.default_rng(1)
        with ServingClient(("127.0.0.1", port)) as cli:
            for L in (400, 800, 400):
                x = rng.standard_normal(L).astype(np.float32)
                got = cli.infer(x)
                want = np.asarray(load_pipeline(arts[L])(
                    jnp.asarray(x.reshape(1, 1, L))))[0]
                np.testing.assert_array_equal(got, want)
            with pytest.raises(RuntimeError, match="no artifact serves"):
                cli.infer(np.zeros(600, np.float32))
            # framing survived the in-band error: same connection works
            x = rng.standard_normal(400).astype(np.float32)
            assert cli.infer(x).shape == (ECHOES,)
            # live stats over the same connection: aggregated + per-length
            s = cli.stats()
            assert s["requests"] == 4 and set(s["per_length"]) == {"400",
                                                                   "800"}
    finally:
        server.shutdown()
        server.server_close()
        host.close()

    import pytest as _pytest
    with _pytest.raises(SystemExit, match="distinct"):
        build({"artifact": f"{arts[400]},{arts[400]}", "max_batch": 4})

    # multi-length composes with dp-mesh serving: every per-length host
    # gets its own mesh-wrapped pipeline, buckets restricted to
    # dp-divisible sizes; decode still matches the plain artifact
    host, server, port = build(
        {"artifact": f"{arts[400]},{arts[800]}", "max_batch": 8,
         "mesh": True, "mesh_dp": 4, "warmup": False})
    try:
        with ServingClient(("127.0.0.1", port)) as cli:
            for L in (400, 800):
                x = np.random.default_rng(2).standard_normal(
                    (4, L)).astype(np.float32)
                got = cli.infer(x)
                want = np.asarray(load_pipeline(arts[L])(
                    jnp.asarray(x[:, None])))
                np.testing.assert_array_equal(got, want)
    finally:
        server.shutdown()
        server.server_close()
        host.close()


def test_batch_buckets():
    assert batch_buckets(128) == (1, 2, 4, 8, 16, 32, 64, 128)
    assert batch_buckets(12) == (1, 2, 4, 8, 12)
    assert batch_buckets(1) == (1,)
    with pytest.raises(ValueError):
        batch_buckets(0)


def test_host_matches_direct_pipeline_exactly(live_pipeline):
    """Concurrent mixed-size requests through the host decode bit-exactly
    as each request run alone — coalescing and zero-padding are invisible
    (row-local pipeline; probed exact on this backend)."""
    rng = np.random.default_rng(0)
    reqs = [rng.standard_normal(
        (int(rng.integers(1, 6)), 1, LENGTH)).astype(np.float32)
        for _ in range(12)]
    want = [np.asarray(live_pipeline(jnp.asarray(r))) for r in reqs]

    with ServingHost(live_pipeline, LENGTH, max_batch=16,
                     max_wait_ms=20.0) as host:
        futures = [None] * len(reqs)

        def client(lo, hi):
            for i in range(lo, hi):
                futures[i] = host.submit(reqs[i])

        threads = [threading.Thread(target=client, args=(i * 3, i * 3 + 3))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        got = [f.result(60.0) for f in futures]

    for g, w, r in zip(got, want, reqs):
        assert g.shape == (r.shape[0], ECHOES)
        np.testing.assert_array_equal(g, w)
    s = host.stats()
    assert s["requests"] == 12
    assert s["waveforms"] == sum(r.shape[0] for r in reqs)
    assert 0 < s["occupancy"] <= 1.0
    assert "latency_p50_ms" in s and "latency_p99_ms" in s


def test_device_sees_only_bucket_shapes():
    pipe = RecordingPipeline()
    with ServingHost(pipe, LENGTH, max_batch=8, max_wait_ms=5.0) as host:
        rng = np.random.default_rng(1)
        futs = [host.submit(rng.standard_normal(
            (k, LENGTH)).astype(np.float32)) for k in (3, 1, 5, 2, 4)]
        outs = [f.result(30.0) for f in futs]
    buckets = set(batch_buckets(8))
    assert pipe.shapes and all(s[0] in buckets and s[1:] == (1, LENGTH)
                               for s in pipe.shapes)
    # slicing returned each request exactly its own rows
    for k, o in zip((3, 1, 5, 2, 4), outs):
        assert o.shape == (k, ECHOES)


def test_coalescing_many_singles_few_calls():
    """While call 1 holds the device, 8 singles queue up; they must ride
    in ONE coalesced batch (deterministic via the gate, no sleeps)."""
    gate = threading.Event()
    pipe = RecordingPipeline(gate=gate)
    host = ServingHost(pipe, LENGTH, max_batch=8, max_wait_ms=0.0)
    try:
        x = np.zeros(LENGTH, np.float32)
        first = host.submit(x)
        while pipe.calls == 0:  # dispatcher picked up the first request
            time.sleep(0.001)
        futs = [host.submit(x) for _ in range(8)]
        gate.set()
        first.result(30.0)
        for f in futs:
            assert f.result(30.0).shape == (ECHOES,)
        assert pipe.calls == 2, f"shapes seen: {pipe.shapes}"
        assert pipe.shapes[1] == (8, 1, LENGTH)
        assert host.stats()["bucket_counts"][8] == 1
    finally:
        gate.set()
        host.close()


def test_submit_shape_errors_raise_immediately():
    with ServingHost(RecordingPipeline(), LENGTH, max_batch=4) as host:
        with pytest.raises(ValueError, match="length"):
            host.submit(np.zeros(LENGTH + 1, np.float32))
        with pytest.raises(ValueError, match="max_batch"):
            host.submit(np.zeros((5, LENGTH), np.float32))
        with pytest.raises(ValueError, match="expected"):
            host.submit(np.zeros((2, 3, LENGTH), np.float32))
        # squeeze semantics both ways
        assert host.infer(np.zeros(LENGTH, np.float32),
                          30.0).shape == (ECHOES,)
        assert host.infer(np.zeros((1, LENGTH), np.float32),
                          30.0).shape == (1, ECHOES)


def test_pipeline_error_fans_out_and_host_survives():
    pipe = RecordingPipeline(fail_on=2)
    with ServingHost(pipe, LENGTH, max_batch=2, max_wait_ms=100.0) as host:
        x = np.zeros(LENGTH, np.float32)
        bad = host.submit(np.zeros((2, LENGTH), np.float32))  # exact bucket 2
        with pytest.raises(RuntimeError, match="injected device fault"):
            bad.result(30.0)
        # the host keeps serving after a device fault
        assert host.infer(x, 30.0).shape == (ECHOES,)
        assert host.stats()["errors"] == 1


def test_close_drains_pending_and_rejects_new():
    gate = threading.Event()
    pipe = RecordingPipeline(gate=gate)
    host = ServingHost(pipe, LENGTH, max_batch=4, max_wait_ms=0.0)
    x = np.zeros(LENGTH, np.float32)
    first = host.submit(x)
    while pipe.calls == 0:
        time.sleep(0.001)
    pending = [host.submit(x) for _ in range(3)]  # queued behind the gate
    closer = threading.Thread(target=host.close)
    closer.start()
    gate.set()
    closer.join(30.0)
    assert not closer.is_alive()
    assert first.result(1.0).shape == (ECHOES,)
    for f in pending:  # drained, not dropped
        assert f.result(1.0).shape == (ECHOES,)
    with pytest.raises(RuntimeError, match="closed"):
        host.submit(x)
    host.close()  # idempotent


def test_admission_control_rejects_overload():
    """max_pending: submits beyond the in-flight waveform cap raise
    Overloaded AT SUBMIT (not in the Future), the rejection is counted,
    accepted work completes untouched, and capacity frees once the
    backlog resolves."""
    from stofnet_tpu.serving import Overloaded

    gate = threading.Event()
    pipe = RecordingPipeline(gate=gate)
    host = ServingHost(pipe, LENGTH, max_batch=2, max_pending=3,
                       max_wait_ms=0.0)
    try:
        x = np.zeros(LENGTH, np.float32)
        futs = [host.submit(x) for _ in range(3)]  # 1 in flight + 2 queued
        with pytest.raises(Overloaded, match="max_pending=3"):
            host.submit(x)
        assert host.stats()["rejected"] == 1
        assert host.stats()["pending"] == 3
        gate.set()
        for f in futs:
            assert f.result(timeout=30.0).shape == (ECHOES,)
        # capacity freed: the previously rejected load now admits
        assert host.submit(x).result(timeout=30.0).shape == (ECHOES,)
        s = host.stats()
        assert s["pending"] == 0 and s["requests"] == 4
    finally:
        gate.set()
        host.close()


def test_admission_limit_below_max_batch_rejected():
    """max_pending < max_batch would make a legal full-bucket request
    permanently unadmittable even on an idle host — the config is
    rejected at construction, not discovered as a misleading 'queue
    full' in production (advisor r3)."""
    with pytest.raises(ValueError, match="max_pending=2 < max_batch=4"):
        ServingHost(RecordingPipeline(), LENGTH, max_batch=4, max_pending=2)
    # the boundary (== max_batch) is legal
    ServingHost(RecordingPipeline(), LENGTH, max_batch=4,
                max_pending=4).close()


def test_admission_control_over_tcp(live_pipeline):
    """An Overloaded rejection reports in-band over TCP; the connection
    and the daemon keep serving (cli max_pending= plumbs through)."""
    from stofnet_tpu.serving import LengthRouter

    gate = threading.Event()
    pipe = RecordingPipeline(gate=gate)
    host = ServingHost(pipe, LENGTH, max_batch=1, max_pending=1,
                       max_wait_ms=0.0)
    server, _, port = start_server(LengthRouter({LENGTH: host}))
    try:
        with ServingClient(("127.0.0.1", port)) as blocked, \
                ServingClient(("127.0.0.1", port)) as cli:
            waiter = threading.Thread(
                target=blocked.infer, args=(np.zeros(LENGTH, np.float32),),
                daemon=True)
            waiter.start()
            deadline = time.monotonic() + 10.0
            while host.stats()["pending"] < 1:  # in flight, gate held
                assert time.monotonic() < deadline, "first submit never ran"
                time.sleep(0.005)
            with pytest.raises(RuntimeError, match="Overloaded"):
                cli.infer(np.zeros(LENGTH, np.float32))
            gate.set()
            waiter.join(30.0)
            # same connection admits once capacity frees
            assert cli.infer(np.zeros(LENGTH, np.float32)).shape == (ECHOES,)
        assert host.stats()["rejected"] == 1
    finally:
        gate.set()
        server.shutdown()
        server.server_close()
        host.close()


def test_tcp_stats_query(live_pipeline):
    """The SFNS control message returns the host's LIVE stats over the
    data connection — monitoring without stopping the daemon. Counters
    move between queries; infer keeps working after a stats round."""
    with ServingHost(live_pipeline, LENGTH, max_batch=4) as host:
        server, _, port = start_server(host)
        try:
            with ServingClient(("127.0.0.1", port)) as cli:
                s0 = cli.stats()
                assert s0["requests"] == 0 and "occupancy" in s0
                cli.infer(np.zeros(LENGTH, np.float32))
                s1 = cli.stats()
                assert s1["requests"] == 1 and s1["waveforms"] == 1
                assert "latency_p50_ms" in s1
                assert cli.infer(np.zeros(LENGTH, np.float32)).size
        finally:
            server.shutdown()
            server.server_close()


def test_c_client_speaks_the_protocol(live_pipeline, tmp_path):
    """examples/serving_client.c: the wire protocol is language-agnostic
    — a dependency-free POSIX C client round-trips a waveform and the
    stats query against a live daemon, coords bit-exact vs the direct
    pipeline."""
    import shutil
    import subprocess
    from pathlib import Path

    src = Path(__file__).resolve().parent.parent / "examples" / \
        "serving_client.c"
    cc = shutil.which("gcc")
    cmd = [cc, "-O2"] if cc else [shutil.which("g++"), "-O2", "-x", "c"]
    if cmd[0] is None:
        pytest.skip("no C compiler available")
    exe = tmp_path / "serving_client"
    subprocess.run([*cmd, "-o", str(exe), str(src), "-lm"], check=True)

    with ServingHost(live_pipeline, LENGTH, max_batch=4) as host:
        server, _, port = start_server(host)
        try:
            x = np.random.default_rng(7).standard_normal(LENGTH).astype(
                np.float32)
            proc = subprocess.run(
                [str(exe), "127.0.0.1", str(port), str(LENGTH)],
                input=x.tobytes(), capture_output=True, check=True,
                timeout=120)
            got = np.array([float(v) for v in proc.stdout.split()],
                           np.float32)
            want = np.asarray(live_pipeline(x[None, None]))[0]
            np.testing.assert_array_equal(got, want)
            assert b'"requests": 1' in proc.stderr  # live stats round

            # compact wires: bf16 is absorbed by the pipeline's own bf16
            # input cast (bit-exact vs f32); int8's C encoder matches the
            # python codec sample for sample (lrintf under the default
            # FE_TONEAREST mode == np.rint), so the decoded coords equal
            # the pipeline on the python round-tripped payload
            from stofnet_tpu.serving import decode_payload, encode_rows
            from stofnet_tpu.serving.tcp import WIRE_INT8, WIRE_INT16

            for wire_name, wire_want in (
                    ("bf16", want),
                    ("int8", np.asarray(live_pipeline(decode_payload(
                        encode_rows(x[None], WIRE_INT8), WIRE_INT8, 1,
                        LENGTH)))[0]),
                    ("s16", np.asarray(live_pipeline(decode_payload(
                        encode_rows(x[None], WIRE_INT16), WIRE_INT16, 1,
                        LENGTH)))[0])):
                p = subprocess.run(
                    [str(exe), "127.0.0.1", str(port), str(LENGTH),
                     wire_name],
                    input=x.tobytes(), capture_output=True, check=True,
                    timeout=120)
                got_w = np.array([float(v) for v in p.stdout.split()],
                                 np.float32)
                np.testing.assert_array_equal(got_w, wire_want)

            # in-band server errors map to the client's distinct exit
            # code (2) with the message on stderr — here a wrong-length
            # request
            bad = subprocess.run(
                [str(exe), "127.0.0.1", str(port), str(LENGTH // 2)],
                input=x[:LENGTH // 2].tobytes(), capture_output=True,
                timeout=120)
            assert bad.returncode == 2
            assert b"server error" in bad.stderr
        finally:
            server.shutdown()
            server.server_close()


def test_wire_codecs_roundtrip():
    """SFN2 payload codecs (serving/tcp.py): f32 is bit-exact; bf16 is
    the round-to-nearest-even f32→bf16 cast exactly (so a bf16-forward
    artifact sees bit-identical inputs either way) and is idempotent;
    int8 is per-waveform scaled with error ≤ scale/2 and zero rows exact."""
    from stofnet_tpu.serving import decode_payload, encode_rows
    from stofnet_tpu.serving.tcp import (WIRE_BF16, WIRE_F32, WIRE_INT8,
                                         payload_nbytes)

    rng = np.random.default_rng(11)
    k, length = 5, 256
    rows = (rng.standard_normal((k, length)) *
            10.0 ** rng.integers(-3, 4, (k, 1))).astype(np.float32)
    rows[3] = 0.0  # all-zero waveform: int8 scale guard

    for wire in (WIRE_F32, WIRE_BF16, WIRE_INT8):
        payload = encode_rows(rows, wire)
        assert len(payload) == payload_nbytes(wire, k, length)
        back = decode_payload(payload, wire, k, length)
        assert back.shape == (k, 1, length) and back.dtype == np.float32

    np.testing.assert_array_equal(
        decode_payload(encode_rows(rows, WIRE_F32), WIRE_F32, k, length),
        rows[:, None])

    # bf16: exact parity with the XLA cast, and encode∘decode idempotent
    back16 = decode_payload(encode_rows(rows, WIRE_BF16), WIRE_BF16, k,
                            length)
    want16 = np.asarray(jnp.asarray(rows).astype(jnp.bfloat16),
                        np.float32)[:, None]
    np.testing.assert_array_equal(back16, want16)
    assert encode_rows(back16[:, 0], WIRE_BF16) == encode_rows(rows,
                                                               WIRE_BF16)

    back8 = decode_payload(encode_rows(rows, WIRE_INT8), WIRE_INT8, k,
                           length)[:, 0]
    step = np.max(np.abs(rows), axis=-1, keepdims=True) / 127.0
    assert np.all(np.abs(back8 - rows) <= np.maximum(step / 2, 0) + 1e-9)
    np.testing.assert_array_equal(back8[3], 0.0)


def test_compact_wire_over_tcp():
    """The SFN2 frames round-trip through a live server: the response for
    each wire equals the pipeline applied to that wire's decoded payload
    (the server is transparent to the encoding), and an unknown wire code
    errors in-band."""
    import socket
    import struct

    from stofnet_tpu.serving import decode_payload, encode_rows
    from stofnet_tpu.serving.tcp import WIRE_BF16, WIRE_INT8

    pipe = RecordingPipeline()
    rng = np.random.default_rng(12)
    x = rng.standard_normal((3, LENGTH)).astype(np.float32)
    with ServingHost(pipe, LENGTH, max_batch=4) as host:
        server, _, port = start_server(host)
        try:
            for wire_name, wire in (("bf16", WIRE_BF16), ("int8", WIRE_INT8)):
                with ServingClient(("127.0.0.1", port),
                                   wire=wire_name) as c:
                    got = c.infer(x)
                want = decode_payload(encode_rows(x, wire), wire, 3,
                                      LENGTH)[:, 0, :ECHOES]
                np.testing.assert_array_equal(got, want)
            # f32 over SFN1 (the default) is bit-exact end to end
            with ServingClient(("127.0.0.1", port)) as c:
                np.testing.assert_array_equal(c.infer(x), x[:, :ECHOES])
            # unknown wire code → in-band error frame
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=30.0) as s:
                s.sendall(b"SFN2" + struct.pack("<BBII", 9, 0, 1, LENGTH))
                head = s.recv(8, socket.MSG_WAITALL)
                status, m = struct.unpack("<iI", head)
                assert status == 1
                assert b"unknown wire" in s.recv(m, socket.MSG_WAITALL)
            with pytest.raises(ValueError, match="wire must be"):
                ServingClient(("127.0.0.1", port), wire="f16")
        finally:
            server.shutdown()
            server.server_close()


def test_bf16_wire_lossless_for_bf16_artifact(live_pipeline):
    """The serving pipeline's forward IS bf16 (make_pipeline default), so
    the bf16 wire's RNE cast is absorbed by the model's own input cast:
    coords over the bf16 wire equal the f32-wire coords bit for bit —
    half the request bytes for free on the default serving config."""
    rng = np.random.default_rng(13)
    x = rng.standard_normal((4, LENGTH)).astype(np.float32)
    with ServingHost(live_pipeline, LENGTH, max_batch=4) as host:
        server, _, port = start_server(host)
        try:
            with ServingClient(("127.0.0.1", port)) as c32, \
                    ServingClient(("127.0.0.1", port), wire="bf16") as c16:
                np.testing.assert_array_equal(c16.infer(x), c32.infer(x))
        finally:
            server.shutdown()
            server.server_close()


def test_warmup_precompiles_every_bucket():
    pipe = RecordingPipeline()
    with ServingHost(pipe, LENGTH, max_batch=8) as host:
        host.warmup()
    assert [s[0] for s in pipe.shapes] == [1, 2, 4, 8]


def test_fixed_bucket_override():
    """buckets=(N,) serves a FIXED-batch export artifact: every coalesced
    batch pads to exactly N regardless of how little queued."""
    pipe = RecordingPipeline()
    with ServingHost(pipe, LENGTH, max_batch=4, buckets=(4,),
                     max_wait_ms=0.0) as host:
        out = host.infer(np.zeros(LENGTH, np.float32), 30.0)
    assert out.shape == (ECHOES,)
    assert all(s[0] == 4 for s in pipe.shapes)
    with pytest.raises(ValueError, match="must end at"):
        ServingHost(pipe, LENGTH, max_batch=4, buckets=(1, 2))


def test_cli_serve_daemon(tmp_path):
    """cli/serve.py end to end: build a daemon from an exported artifact
    (batch-polymorphic AND fixed-batch) and round-trip over its socket;
    argument errors are loud."""
    from stofnet_tpu.cli.serve import build
    from stofnet_tpu.models import StofNet
    from stofnet_tpu.serve import (export_pipeline, make_pipeline,
                                   save_pipeline)

    overrides = {"num_features": 16, "semi_global_scale": 8, "num_blocks": 4}
    model = StofNet(**overrides)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 1, LENGTH)))
    live = jax.jit(make_pipeline(variables, overrides, max_echoes=64))
    poly = save_pipeline(tmp_path / "poly.jaxexp", export_pipeline(
        variables, overrides, batch="b", length=LENGTH, platforms=("cpu",)))
    fixed = save_pipeline(tmp_path / "b4.jaxexp", export_pipeline(
        variables, overrides, batch=4, length=LENGTH, platforms=("cpu",)))

    x = np.random.default_rng(3).standard_normal(
        (2, LENGTH)).astype(np.float32)
    want = np.asarray(live(jnp.asarray(x[:, None])))

    for art, exp_buckets in ((poly, set(batch_buckets(128))), (fixed, {4})):
        hostd, server, port = build({"artifact": str(art), "warmup": False,
                                     "max_wait_ms": 1.0})
        try:
            assert hostd.length == LENGTH
            assert set(hostd.stats()["bucket_counts"]) == exp_buckets
            with ServingClient(("127.0.0.1", port)) as c:
                np.testing.assert_array_equal(c.infer(x), want)
        finally:
            server.shutdown()
            server.server_close()
            hostd.close()

    # mesh=True: dp-sharded serving through the daemon (8 virtual devs);
    # buckets restrict to dp-divisible sizes, results stay bit-exact
    hostd, server, port = build({"artifact": str(poly), "warmup": False,
                                 "mesh": True, "mesh_dp": 4,
                                 "max_batch": 16, "max_wait_ms": 1.0})
    try:
        assert all(b % 4 == 0 for b in hostd.stats()["bucket_counts"])
        with ServingClient(("127.0.0.1", port)) as c:
            np.testing.assert_array_equal(c.infer(x), want)
    finally:
        server.shutdown()
        server.server_close()
        hostd.close()
    with pytest.raises(SystemExit, match="divisible"):
        build({"artifact": str(poly), "mesh": True, "mesh_dp": 4,
               "max_batch": 6})
    with pytest.raises(SystemExit, match="divisible"):
        build({"artifact": str(fixed), "mesh": True, "mesh_dp": 8})

    with pytest.raises(SystemExit, match="not both"):
        build({"artifact": str(poly), "model_file": "x"})
    with pytest.raises(SystemExit, match="unknown argument"):
        build({"artifact": str(poly), "bogus": 1})
    with pytest.raises(SystemExit, match="fixed batch=4"):
        build({"artifact": str(fixed), "max_batch": 8})
    with pytest.raises(SystemExit, match="length= is required"):
        build({"model_file": "different-armadillo"})


def test_tcp_front_roundtrip(live_pipeline):
    """End to end over real sockets: concurrent clients, connection
    reuse, bit-exact vs the direct pipeline, in-band shape errors."""
    rng = np.random.default_rng(2)
    with ServingHost(live_pipeline, LENGTH, max_batch=16,
                     max_wait_ms=10.0) as host:
        server, thread, port = start_server(host)
        try:
            reqs = [rng.standard_normal(
                (int(rng.integers(1, 5)), 1, LENGTH)).astype(np.float32)
                for _ in range(6)]
            want = [np.asarray(live_pipeline(jnp.asarray(r))) for r in reqs]
            got = [None] * len(reqs)

            def client(lo, hi):
                with ServingClient(("127.0.0.1", port)) as c:
                    for i in range(lo, hi):  # reuse one connection
                        got[i] = c.infer(reqs[i][:, 0, :])

            threads = [threading.Thread(target=client, args=(i * 2, i * 2 + 2))
                       for i in range(3)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for g, w in zip(got, want):
                np.testing.assert_array_equal(g, w)

            with ServingClient(("127.0.0.1", port)) as c:
                # squeeze path
                np.testing.assert_array_equal(
                    c.infer(reqs[0][0, 0]), want[0][0])
                # wrong length → in-band error, connection stays usable
                with pytest.raises(RuntimeError, match="length"):
                    c.infer(np.zeros(LENGTH + 1, np.float32))
                np.testing.assert_array_equal(
                    c.infer(reqs[0][0, 0]), want[0][0])
        finally:
            server.shutdown()
            server.server_close()
            thread.join(10.0)
