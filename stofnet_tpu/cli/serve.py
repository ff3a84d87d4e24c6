"""Serving daemon: dynamic-batching TCP inference on one command.

No reference equivalent (/root/reference/main.py:291-347 evaluates fixed
datasets in process; it has no serving story). Usage — from an exported
artifact (cli/export.py; preferred for production: no model code or
checkpoint resolution at serving time)::

    python -m stofnet_tpu.cli.serve artifact=stofnet.jaxexp port=7733

Several artifacts (comma-separated) serve MULTIPLE waveform lengths from
one port — requests route by length (per-probe frame lengths each get
their own length-specialized artifact and dynamic-batching dispatcher)::

    python -m stofnet_tpu.cli.serve artifact=l8000.jaxexp,l16000.jaxexp

or straight from a checkpoint (jit-compiles locally; accepts the same
architecture-override keys as the exporter, plus int8_calib=; the whole
zoo serves via model= + its family knobs, e.g. ``model=edsr
model_file=proud-cherry length=8000`` or the parameter-free
``model=gradpeak length=8000 th=1e-5``)::

    python -m stofnet_tpu.cli.serve model_file=different-armadillo \
        length=8000 port=7733 [th=Null] [max_echoes=64] [int8_calib=x.npy
        [int8_stack=4,8,10] [int8_eq_alpha=0.5] [int8_bias_correct=True]]

Tuning: ``max_batch=`` (largest coalesced device batch), ``max_wait_ms=``
(latency the oldest request may spend waiting for the batch to fill),
``warmup=False`` to skip pre-compiling every bucket at startup;
``compile_cache=DIR`` persists bucket compiles so daemon restarts skip
them; ``max_pending=N`` caps waveforms in flight per length (admission
control: overload rejects in-band instead of growing the queue).
``mesh=True [mesh_dp=N]`` shards every served batch over a dp device mesh
(multi-chip serving from one daemon; buckets restricted to dp-divisible
sizes so GSPMD splits them evenly).

Speak to it with ``stofnet_tpu.serving.ServingClient`` (or any client of
the length-prefixed protocol in serving/tcp.py). On SIGINT/SIGTERM the
daemon drains queued requests and prints occupancy/latency stats.
"""

from __future__ import annotations

import signal
import sys
import threading
from typing import Any, Dict, List, Optional, Tuple

from stofnet_tpu.cli.export import (apply_dtype_gate, load_calib,
                                    load_stack_cfg, parse_args,
                                    resolve_dtype,
                                    resolve_variables_and_overrides)

_KNOWN_KEYS = frozenset({
    "artifact", "model_file", "ckpt_dir", "length", "th", "window_size",
    "max_echoes", "int8_calib", "int8_stack", "int8_eq_alpha",
    "int8_bias_correct", "host", "port", "max_batch", "max_wait_ms",
    "warmup", "mesh", "mesh_dp", "mesh_sp", "compile_cache", "max_pending",
    "num_features", "semi_global_scale", "num_blocks", "upsample_factor",
    # whole-zoo serving from a checkpoint (same switch as the exporter)
    "model", "dataset_kind", "rf_scale_factor", "sample_num", "fs",
    "n_layers", "dtype",
    # input_enc=bf16|s16|s8c<n>: ship compact codes on the host->device
    # leg (the measured serving ceiling); same schemes as the exporter
    "input_enc",
})


def _mesh_wrap(pipeline, args: Dict[str, Any]) -> Tuple[Any, int]:
    """``mesh=True [mesh_dp=N] [mesh_sp=M]``: shard every served batch
    over a (dp, sp) mesh (same convention as cli/main.py's mesh flags) —
    GSPMD splits the batch across dp, and with ``mesh_sp>1`` also shards
    the RF sample axis over sp (halo exchanges for the convs, gathers for
    the SGB pooled pathway and the decode top_k) — the long-L serving
    regime ``bench.py --lscaling`` measures to L=160k. Exported artifacts
    work too: the deserialized call is jax-traceable and re-jits under
    in_shardings (tests/test_serve.py::test_exported_artifact_serves_on_
    dp_mesh, sp variant in __graft_entry__.dryrun_multichip)."""
    import jax

    from stofnet_tpu.parallel import (batch_seq_sharding, batch_sharding,
                                      make_mesh)

    sp = int(args.get("mesh_sp", 1) or 1)
    dp = int(args.get("mesh_dp", 0) or len(jax.devices()) // sp)
    # a serving mesh may use a subset of the host's chips (mesh_dp=4 on an
    # 8-chip worker leaves the rest for other daemons)
    mesh = make_mesh(dp=dp, sp=sp, devices=jax.devices()[:dp * sp])

    def data_sharding(aval):
        """Batch axis over dp always; the sample/length axis (the last
        one) over sp. Encoded artifacts' per-chunk scales align with the
        length too (n_chunks divides L), so the same rule applies; the
        s16 scale's singleton last axis must stay replicated."""
        if sp > 1 and int(aval.shape[-1]) > 1:
            return batch_seq_sharding(mesh, aval.ndim, seq_axis=-1)
        return batch_sharding(mesh, aval.ndim)

    if getattr(pipeline, "input_enc", "f32") != "f32":
        # encoded-input artifact: keep the host-side numpy encode OUT of
        # the traced function (it is the transfer win), shard the codes
        # over the mesh — every enc's device args are batch-major
        raw, encode = pipeline.raw_call, pipeline.encode
        shardings = tuple(data_sharding(a) for a in pipeline.raw_in_avals)
        raw_sharded = jax.jit(lambda *data: raw(*data),
                              in_shardings=shardings)

        def piped(xb):
            return raw_sharded(*encode(xb))

        return piped, dp
    sharding = data_sharding(pipeline.in_avals[0]) if hasattr(
        pipeline, "in_avals") else (
        batch_seq_sharding(mesh, 3, seq_axis=-1) if sp > 1
        else batch_sharding(mesh, 3))
    return jax.jit(lambda xb: pipeline(xb), in_shardings=(sharding,)), dp


def build(args: Dict[str, Any]):
    """Resolve args to a ready (ServingHost, ServingTCPServer, port).
    Separated from main() so tests and embedders can drive the daemon
    without signal handling."""
    unknown = set(args) - _KNOWN_KEYS
    if unknown:
        raise SystemExit(f"unknown argument(s) {sorted(unknown)}; "
                         f"supported: {sorted(_KNOWN_KEYS)}")

    if args.get("compile_cache"):
        # persistent XLA compilation cache: a daemon restart re-compiles
        # every warmup bucket over the relay (~20-60 s each) otherwise —
        # the dominant share of the measured cold start
        # (docs/SERVE_DAEMON_tpu.md). Process-lifetime scope: the daemon
        # owns its process, so no restore is needed (cf. cli/main.py's
        # run-scoped variant).
        import jax
        from jax.experimental.compilation_cache import compilation_cache

        jax.config.update("jax_compilation_cache_dir",
                          str(args["compile_cache"]))
        # threshold 0: persist EVERY bucket — a compile that happened to
        # be fast this time still costs a full relay compile round trip
        # at the next daemon restart (and a >0 threshold makes warm-
        # process warmups skip persistence entirely)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # the persistent cache object is created lazily ONCE; if an
        # earlier compile in this process already initialized it (with a
        # different dir or none), the dir update above is ignored —
        # reset so warmup compiles land in THIS daemon's cache
        compilation_cache.reset_cache()

    from stofnet_tpu.serving import ServingHost, start_server

    if args.get("artifact"):
        if args.get("model_file"):
            raise SystemExit("pass artifact= OR model_file=, not both")
        raw = args["artifact"]
        paths = ([str(p) for p in raw] if isinstance(raw, (list, tuple))
                 else [p.strip() for p in str(raw).split(",") if p.strip()])
        hosts = []
        try:
            for p in paths:
                hosts.append(_artifact_host(p, args, ServingHost))
            if len(hosts) == 1:
                hostd = hosts[0]
            else:
                # one daemon, one port, N per-probe lengths: requests
                # route by waveform length (the protocol carries L)
                from stofnet_tpu.serving import LengthRouter

                by_length = {}
                for p, h in zip(paths, hosts):
                    if h.length in by_length:
                        raise SystemExit(
                            f"artifacts {by_length[h.length]} and {p} "
                            f"both serve length {h.length}; lengths must "
                            f"be distinct to route by waveform length")
                    by_length[h.length] = p
                hostd = LengthRouter({h.length: h for h in hosts})
            return _finish(hostd, args)
        except BaseException:
            # don't leak dispatcher threads into the embedding process on
            # ANY failure (missing artifact, duplicate length, warmup
            # error); close() is idempotent
            for built in hosts:
                built.close(timeout=5.0)
            raise
    if args.get("model_file") or str(args.get("model", "")).lower() == \
            "gradpeak":
        if not args.get("length"):
            raise SystemExit("length= is required with model_file= "
                             "(the serving contract's static length)")
        import jax

        from stofnet_tpu.serve import make_pipeline

        model = str(args.get("model") or "stofnet").lower()
        if model == "stofnet":
            variables, overrides = resolve_variables_and_overrides(args)
        else:
            # whole-zoo serving straight from a checkpoint, same switch
            # as the exporter (reference main.py:133-167)
            if any(args.get(k) for k in ("int8_calib", "int8_stack",
                                         "int8_eq_alpha",
                                         "int8_bias_correct")):
                raise SystemExit("int8 serving targets model=stofnet only")
            from stofnet_tpu.cli.export import (
                resolve_zoo_variables_and_overrides)

            variables, overrides = resolve_zoo_variables_and_overrides(
                args, model)
        th = args.get("th")
        pipe_kwargs = dict(
            window_size=int(args.get("window_size", 20)),
            threshold=None if th in (None, "Null") else float(th),
            max_echoes=int(args.get("max_echoes", 64)),
            int8_calib=load_calib(args), **load_stack_cfg(args))
        # dtype=auto (the default) self-checks bf16 decode agreement and
        # falls back to f32 when the gate fires — same gate as the
        # exporter (cli/export.apply_dtype_gate)
        dtype = apply_dtype_gate(resolve_dtype(args), variables, overrides,
                                 model_name=model,
                                 length=int(args["length"]), **pipe_kwargs)
        enc = str(args.get("input_enc") or "f32")
        pipeline = jax.jit(make_pipeline(
            variables, overrides, model_name=model, dtype=dtype,
            input_enc=None if enc == "f32" else enc, **pipe_kwargs))
        if enc != "f32":
            # same shape as an encoded artifact: host-side numpy encode,
            # compact codes on the host->device leg; expose the encoding
            # attrs so _mesh_wrap shards the codes
            from stofnet_tpu.serve import (encoded_input_specs,
                                           make_input_encoder)

            encoder = make_input_encoder(enc)
            jp = pipeline

            def pipeline(xb, _jp=jp, _enc=encoder):
                return _jp(*_enc(xb))

            pipeline.input_enc = enc
            pipeline.encode = encoder
            pipeline.raw_call = jp
            pipeline.raw_in_avals = encoded_input_specs(
                enc, int(args.get("max_batch", 128)), int(args["length"]))
        max_batch = int(args.get("max_batch", 128))
        pipeline, buckets = _mesh_adjust(pipeline, args, None, max_batch)
        hostd = ServingHost(pipeline, int(args["length"]),
                            max_batch=max_batch,
                            max_wait_ms=float(args.get("max_wait_ms", 2.0)),
                            buckets=buckets,
                            max_pending=_max_pending(args))
        try:
            return _finish(hostd, args)
        except BaseException:
            hostd.close(timeout=5.0)
            raise
    raise SystemExit("artifact=<.jaxexp> or model_file=<ckpt> required")


def _max_pending(args: Dict[str, Any]):
    """``max_pending=N``: admission limit (waveforms submitted but not
    yet resolved, per length) — open-loop producers should set it so
    overload rejects loudly instead of growing the queue without bound;
    unset = unbounded (the closed-loop default)."""
    v = args.get("max_pending")
    return None if v in (None, "Null") else int(v)


def _mesh_adjust(pipeline, args: Dict[str, Any], buckets, max_batch: int):
    """``mesh=True``: wrap the pipeline for dp sharding and restrict
    buckets to dp-divisible sizes; no-op otherwise."""
    if not args.get("mesh"):
        return pipeline, buckets
    from stofnet_tpu.serving import batch_buckets

    pipeline, dp = _mesh_wrap(pipeline, args)
    if max_batch % dp:
        raise SystemExit(f"max_batch={max_batch} must be divisible by "
                         f"the dp mesh size {dp}")
    if buckets is not None and any(b % dp for b in buckets):
        raise SystemExit(f"fixed artifact batch {buckets} not divisible "
                         f"by the dp mesh size {dp}")
    if buckets is None:
        # only dp-divisible batches shard evenly; sub-dp requests pad
        # up to one waveform per chip
        buckets = tuple(b for b in batch_buckets(max_batch) if b % dp == 0)
    return pipeline, buckets


def _artifact_host(path: str, args: Dict[str, Any], ServingHost):
    """One ServingHost from one export artifact (its static length is the
    routing key when several artifacts share the daemon)."""
    from stofnet_tpu.serve import load_pipeline

    pipeline = load_pipeline(path)
    (aval,) = pipeline.in_avals
    length = int(aval.shape[-1])  # length is static in every export
    batch_dim = aval.shape[0]
    # a fixed-batch artifact can only run its one exported size: the
    # host must use that size as its single bucket
    fixed = int(batch_dim) if str(batch_dim).isdigit() else None
    max_batch = int(args.get("max_batch", fixed or 128))
    if fixed is not None and max_batch != fixed:
        raise SystemExit(
            f"artifact was exported at fixed batch={fixed}; serve it "
            f"with max_batch={fixed} (or re-export with batch=b for "
            f"a batch-polymorphic artifact)")
    buckets = (fixed,) if fixed is not None else None
    pipeline, buckets = _mesh_adjust(pipeline, args, buckets, max_batch)
    return ServingHost(pipeline, length, max_batch=max_batch,
                       max_wait_ms=float(args.get("max_wait_ms", 2.0)),
                       buckets=buckets, max_pending=_max_pending(args))


def _finish(hostd, args: Dict[str, Any]):
    """Warmup + bind; shared tail for single-host and routed daemons."""
    from stofnet_tpu.serving import start_server

    if args.get("warmup", True):
        print("warming up (pre-compiling every served batch shape)...",
              file=sys.stderr)
        hostd.warmup()
    server, _, port = start_server(
        hostd, (str(args.get("host", "127.0.0.1")), int(args.get("port", 0))))
    return hostd, server, port


def main(argv: Optional[List[str]] = None) -> None:
    args = parse_args(argv)
    hostd, server, port = build(args)
    lengths = getattr(hostd, "lengths", None) or (hostd.length,)
    print(f"serving waveforms of length{'s' if len(lengths) > 1 else ''} "
          f"{', '.join(map(str, lengths))} on "
          f"{args.get('host', '127.0.0.1')}:{port}; ctrl-c to stop",
          file=sys.stderr)

    stop = threading.Event()
    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, lambda *_: stop.set())
    stop.wait()
    print("draining...", file=sys.stderr)
    server.shutdown()
    server.server_close()
    hostd.close()
    print(f"served: {hostd.stats()}", file=sys.stderr)


if __name__ == "__main__":
    main()
