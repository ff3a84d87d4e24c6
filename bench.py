"""Headline benchmark: StofNet RF->ToF inference throughput on one TPU chip.

Operating point from BASELINE.json: batch 128, L=8000 RF samples, upsample
x4, reference ``different-armadillo`` weights. We measure the full on-chip
pipeline — model forward + NMS + peak decoding — with only the decoded
(B, 8) ToF coordinates leaving the device (the reference times the forward
alone, main.py:313-315, and then decodes on host; our fused pipeline does
strictly more work per waveform).

Timing is sustained-throughput over a device-resident stream: K batches are
processed by one compiled ``lax.scan`` (weights loaded once, the serving
pattern for a buffered RF stream) and all decoded coordinates are fetched.
This measures the chip's actual pipeline rate; per-call measurements through
this container's axon relay are bounded by its ~140 ms dispatch round-trip,
which is a harness artifact, not hardware (a host-fed number is also
reported so the serving-with-transfer story is on record).
NOTE: block_until_ready() does not actually synchronize through the axon
relay — only host fetches do, hence explicit np.asarray on outputs.

All compute paths are measured when available and reported side by side
(the fastest gate-passing one is served as the headline):
- xla: the flax StofNet lowered by XLA (baseline path, always available)
- xla-packed: position-packed convs, full 128-lane MXU utilization
  (ops/packed_conv.py)
- xla-int8sgb: the SGB contract conv on the MXU's 2x s8 path with an
  int8 pre-pool tensor (models/int8.py) — attacks the measured 4.2 ms
  gap directly
- pallas-fused: SGB contract+pool and the conv stack as Pallas kernels
  (ops/pallas/*); the Mosaic compile helper in this harness is
  intermittently down, so compilation is retried with backoff and the
  path is skipped (not fatal) if it stays unavailable.

MFU is computed from XLA's own cost analysis of the lowered pipeline
against the v5e bf16 peak (197 TFLOP/s).

Prints exactly ONE JSON line; vs_baseline is the speedup over the measured
CPU PyTorch reference (6.9 waveforms/s, BASELINE.md). Extra keys carry the
per-path numbers.

Resilience (r2 post-mortem: BENCH_r02 died rc=1 on ONE unretried
FAILED_PRECONDITION fetch): every main-path fetch goes through ``fetch()``
(3x bounded retry, 75 s backoff), and an outer ``respawn_on_failure`` belt
re-execs the whole process (fresh interpreter, fresh axon chip claim) up to
3 attempts with a 120 s wedge-recovery wait — a wedged claim poisons the
backend for the whole process, so only a re-exec can recover it. A fetch
that HANGS instead of raising (the observed full-outage failure mode) trips
a 720 s watchdog (``FETCH_TIMEOUT_S``): every mode's first device contact
(``setup()``) and every gate/warmup fetch escalate to the belt instead of
blocking until the driver's kill (a MID-run relay death inside a raw timed
loop can still hang — accepted: never observed, and watchdogging the timed
fetches would perturb the measurement). A hang gets ONE re-exec after a
240 s wedge-recovery sleep (r3 post-mortem: the round-end capture's first
contact hung >720 s immediately after a builder hardware run — a claim
wedge a FRESH process claim rides out, not an outage). If even the re-exec
budget is exhausted (r3 saw a multi-hour relay outage no bounded retry
can bridge), the last hardware-validated record for the mode is served from
``BENCH_LAST_GOOD.json`` with ``stale: true`` + ``stale_reason`` +
``measured_at`` — an honestly-labelled real measurement instead of a stack
trace. Deterministic regressions (ShapeRegression) are never masked.

Usage: python bench.py [--oom-demo | --scaling | --lscaling | --train |
                        --serve | --soak]
  --oom-demo: instead of the throughput bench, run the B=2048 L=8k memory
  experiment (XLA path OOMs on the (B, L, 512) SGB pre-pool tensor; the
  Pallas-fused SGB keeps it in VMEM tiles; the int8-SGB path shrinks it
  to s8) and print one JSON line with each path's outcome.
  --scaling: batch-size scaling curve (B=1..1024) of the XLA pipeline.
  --serve: dynamic-batching serving host under closed-loop single-waveform
  clients (1/8/128) — sustained wf/s, client p50/p99 latency, occupancy.
  --soak: 10-minute sustained serving soak (32 closed-loop clients) with
  per-minute throughput windows — drift, transient client errors survived,
  clean drain. The stability artifact the short load curve can't show.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_WF_S = 6.9  # measured reference CPU throughput (BASELINE.md)
BATCH = 128
LENGTH = 8000


def make_gate_batch(batch: int, length: int, rng) -> "np.ndarray":
    """Echo-bearing parity-gate batch: ONE gaussian-windowed tone echo per
    waveform (σ=120 RF samples, carrier 0.012 cyc/sample — the trained
    chirp distribution at rf_scale=10, data/synthetic.py) at a random
    position/SNR over a noise floor, max-normalized like the serving
    inputs.

    The gate batches used to be pure gaussian noise. With the benchmark
    decode in the reference's ``th=Null`` mode (keep each row's single
    strongest NMS peak, ops/peaks.py:threshold_scores), a noise draw made
    the 0.99 coordinate-agreement gates measure which of a row's
    near-equal NOISE maxima ranks first — a coin flip under any numeric
    perturbation, unrelated to the serving contract. Measured on the r3
    noise draw (CPU, B=128): the int8 path's 9/1024 misses were ALL such
    rank flips (each "miss" a different noise peak thousands of samples
    away — zero localization error; bf16 itself only reached 0.995-0.996
    on hardware for the same reason). On THIS distribution — the task the
    checkpoint was trained for — the echo response dominates, the argmax
    is well-determined, and disagreement means a path genuinely moved a
    decoded ToA: bf16 gates at 0.9971 and int8-SGB at 0.9961 (CPU,
    identical low-SNR flip rows), so the gate now measures localization
    fidelity instead of tie-breaking luck. Timing is unaffected: every
    measured program is shape-static and streams per-iteration staged
    noise exactly as before (data content does not change the schedule).
    """
    from stofnet_tpu.data.synthetic import gate_batch

    return gate_batch(batch, length, rng, margin=500.0)
V5E_BF16_PEAK = 197e12  # TFLOP/s, TPU v5e (v5 lite) bf16 systolic peak
# Partial-stack int8 serving config, chosen by the CPU per-layer
# sensitivity sweep on echo-bearing gate batches
# (scripts/int8_stack_sweep.py; None disables the xla-int8stack
# candidate). Filled in once the sweep lands a gate-passing subset.
INT8_STACK_LAYERS = None
INT8_STACK_ALPHA = None
INT8_STACK_BC = False  # calibration-time PTQ bias correction (int8.py)
MOSAIC_RETRIES = 3
MOSAIC_BACKOFF_S = 30.0
FETCH_RETRIES = 3
FETCH_BACKOFF_S = 75.0
PROCESS_ATTEMPTS = 3
PROCESS_BACKOFF_S = 120.0
# Last hardware-validated result per mode, committed to the repo. Served —
# explicitly marked "stale" — when the relay outlasts the retry budget.
CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_LAST_GOOD.json")


# hard process exit that skips interpreter teardown — needed when a
# watchdogged fetch thread is permanently blocked in the relay's native
# call (teardown aborts on it); module-level so tests can monkeypatch
_exit = os._exit


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _load_cache() -> dict:
    try:
        with open(CACHE_FILE) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001 - missing/corrupt cache == no cache
        return {}


def emit(record: dict, mode: str) -> None:
    """Print the one-line JSON result and persist it as the last
    hardware-validated record for ``mode``. The cache is what
    ``respawn_on_failure`` serves — explicitly marked ``stale`` — when the
    axon relay is unreachable for longer than the retry budget (r3 saw a
    >12 h relay outage; no bounded retry bridges that, and a bare stack
    trace is not a benchmark record)."""
    print(json.dumps(record))
    try:
        # never let a CPU run (tests, relay-down debugging with
        # PALLAS_AXON_POOL_IPS=) overwrite the committed HARDWARE record
        if not os.environ.get("STOFNET_BENCH_CACHE_ANYWAY"):
            import jax

            if jax.devices()[0].platform not in ("tpu", "axon"):
                log(f"backend {jax.devices()[0].platform!r} is not TPU; "
                    f"NOT caching this record as last-good")
                return
        cache = _load_cache()
        cache[mode] = {
            "record": record,
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = CACHE_FILE + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1)
        os.replace(tmp, CACHE_FILE)
    except Exception as e:  # noqa: BLE001 - caching never fails the bench
        log(f"last-good cache write failed ({type(e).__name__}); ignored")


class ShapeRegression(Exception):
    """Deterministic pipeline-output regression — never retried."""


class FetchTimeout(Exception):
    """A fetch that HUNG instead of raising. During a full relay outage the
    first device fetch blocks forever (observed r3: profile_train printed
    ``device: TPU v5 lite0`` then nothing for hours) — without a watchdog
    the bench would hang until the driver kills it and no JSON line would
    ever be printed. Raised straight to ``respawn_on_failure`` (the hung
    claim poisons this process; an in-process retry would just hang again)."""


# Above the documented worst healthy case (first fetch after a previous TPU
# process can stall 5-10 min on a claim wedge, CLAUDE.md) so the watchdog
# only fires on real outages.
FETCH_TIMEOUT_S = float(os.environ.get("STOFNET_BENCH_FETCH_TIMEOUT_S",
                                       "720"))
# r3 ended with BENCH_r03.json stale because the round-end capture's FIRST
# contact hung >720 s — right after a builder hardware run, i.e. exactly the
# post-process claim wedge (CLAUDE.md: the next process's first fetch can
# stall 5-10+ min, and r3 showed it can outlast even the 12-min watchdog).
# A hang in THIS process cannot be retried in-process (the claim is
# poisoned), but a FRESH process claim after a wedge-recovery sleep is
# precisely what rides it out — so a FetchTimeout now gets ONE re-exec
# (VERDICT r3 #1: ">=2 process attempts with a 120-300 s sleep"). Worst
# case before the stale fallback: 720 + 240 + 720 s ~ 28 min. Only a
# second consecutive hang — a real outage, not a wedge — serves stale.
TIMEOUT_PROCESS_ATTEMPTS = 2
TIMEOUT_BACKOFF_S = 240.0


def _relay_shaped(e: Exception) -> bool:
    """Only environment faults may be answered with the stale cache — a
    deterministic code bug (AttributeError in new bench code, an OOM on
    the main path, ...) must keep failing loudly with rc=1, not be
    laundered into an rc=0 'benchmark result'. Relay faults are untyped
    (JaxRuntimeError wrapping transport errors), so match the observed
    fault text: r2's gate death was FAILED_PRECONDITION; full outages
    present as FetchTimeout hangs."""
    if isinstance(e, FetchTimeout):
        return True
    msg = f"{type(e).__name__}: {e}"
    import re

    return re.search(
        r"FAILED_PRECONDITION|UNAVAILABLE|DEADLINE|unreachable|"
        r"connection|socket|relay|axon|claim", msg, re.IGNORECASE) is not None


def _call_with_watchdog(thunk, timeout_s: float, what: str):
    """Run thunk on a worker thread; if it is still blocked after
    ``timeout_s`` raise :class:`FetchTimeout` in the caller. The worker
    cannot be killed (it is parked in a C-level relay wait) but it is a
    daemon and ``os.execv``/process exit replaces or ends it."""
    import threading

    box: dict = {}

    def target():
        try:
            box["value"] = thunk()
        except BaseException as e:  # noqa: BLE001 - re-raised in caller
            box["error"] = e

    t = threading.Thread(target=target, daemon=True,
                         name=f"bench-fetch[{what}]")
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise FetchTimeout(
            f"{what}: still blocked after {timeout_s:.0f}s (relay hang)")
    if "error" in box:
        raise box["error"]
    return box.get("value")


def fetch(thunk, what: str = "fetch"):
    """Run a device computation + host fetch with bounded in-process retries
    and a hang watchdog.

    The axon relay intermittently fails a fetch with FAILED_PRECONDITION
    (claim wedge after a killed process, ~1-2 min recovery) — r2's bench
    died with rc=1 on exactly one such fault at its first fetch. Transient
    faults recover here; a permanently wedged backend is handled one level
    up by ``respawn_on_failure``; a fetch that HANGS (full relay outage)
    trips the ``FETCH_TIMEOUT_S`` watchdog and escalates immediately.
    """
    last = None
    for attempt in range(1, FETCH_RETRIES + 1):
        try:
            return _call_with_watchdog(thunk, FETCH_TIMEOUT_S, what)
        except FetchTimeout:
            raise  # this process's claim is poisoned; only re-exec helps
        except Exception as e:  # noqa: BLE001 - relay faults are untyped
            last = e
            log(f"{what}: attempt {attempt}/{FETCH_RETRIES} failed "
                f"({type(e).__name__}: {str(e)[:160]})")
            if attempt < FETCH_RETRIES:
                time.sleep(FETCH_BACKOFF_S)
    raise last


def respawn_on_failure(fn, mode: str) -> None:
    """Outer resilience belt. A wedged TPU claim poisons the whole backend
    for this process (every later fetch fails too), so in-process retries
    cannot save it; instead wait out the wedge (~1-2 min per CLAUDE.md) and
    re-exec for a fresh interpreter + fresh chip claim. Bounded by
    STOFNET_BENCH_ATTEMPT. Exactly one JSON line is ever printed: failed
    attempts die before printing, and exec replaces the process image.

    When even the re-exec budget is exhausted (the relay down for hours,
    not a transient wedge — r3 saw a >12 h outage) the last
    hardware-validated record for this mode is served from
    ``BENCH_LAST_GOOD.json``, with ``stale: true``, ``stale_reason`` and
    its original ``measured_at`` timestamp added so the artifact says
    exactly what it is. A :class:`ShapeRegression` (deterministic pipeline
    output mismatch) is never masked by the cache — that is a code bug, not
    an environment fault."""
    attempt = int(os.environ.get("STOFNET_BENCH_ATTEMPT", "1"))
    try:
        fn()
    except ShapeRegression:
        raise  # deterministic — a fresh claim cannot fix it
    except Exception as e:  # noqa: BLE001
        budget = (TIMEOUT_PROCESS_ATTEMPTS if isinstance(e, FetchTimeout)
                  else PROCESS_ATTEMPTS)
        log(f"bench attempt {attempt}/{budget} died: "
            f"{type(e).__name__}: {str(e)[:300]}")
        if attempt >= budget:
            entry = (_load_cache().get(mode) if _relay_shaped(e) else None)
            if entry is not None:
                log(f"relay unreachable after {attempt} process "
                    f"attempts; serving the LAST HARDWARE-VALIDATED "
                    f"{mode} record (measured_at "
                    f"{entry.get('measured_at')}) marked stale")
                record = dict(entry["record"])
                record["stale"] = True
                record["stale_reason"] = (
                    f"relay unreachable: {type(e).__name__}: "
                    f"{str(e)[:200]}")
                record["measured_at"] = entry.get("measured_at")
                print(json.dumps(record))
                if isinstance(e, FetchTimeout):
                    # the watchdogged fetch thread is still BLOCKED inside
                    # the relay's native call; normal interpreter teardown
                    # aborts on that thread (observed 2026-08-19: SIGABRT
                    # rc=134 AFTER the stale JSON line printed) — the
                    # record is out, skip teardown entirely
                    sys.stdout.flush()
                    sys.stderr.flush()
                    _exit(0)
                return
            raise
        backoff = (TIMEOUT_BACKOFF_S if isinstance(e, FetchTimeout)
                   else PROCESS_BACKOFF_S)
        log(f"re-exec with a fresh chip claim in {backoff:.0f}s")
        time.sleep(backoff)
        os.environ["STOFNET_BENCH_ATTEMPT"] = str(attempt + 1)
        sys.stderr.flush()
        sys.stdout.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)


def setup():
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.models import StofNet
    from stofnet_tpu.models.torch_import import import_stofnet

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # first-contact probe UNDER THE WATCHDOG: in the observed full-outage
    # mode jax.devices() still answers but the first real fetch hangs
    # forever (docs/BENCH_r03_builder.md). Every mode calls setup(), so a
    # start-of-run outage always escalates to the respawn/stale belt here
    # instead of hanging modes whose later fetches are raw timed loops
    # (a MID-run relay death in those loops can still ride until the
    # driver's kill — accepted, it has never been observed).
    fetch(lambda: float(np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)[0]),
          "first device contact")

    ckpt = "/root/reference/ckpts/different-armadillo-1439_rf-scale10_epoch_46.pth"
    try:
        variables, overrides = import_stofnet(ckpt)
    except Exception as e:  # no reference tree: bench random weights
        log(f"ckpt import failed ({e}); using random init")
        model = StofNet()
        variables = model.init(jax.random.key(0), jnp.zeros((1, 1, LENGTH)))
        overrides = {}
    return variables, overrides


def make_decoder(overrides):
    """The shared heatmap->coords decode for every measured path, with the
    upsample factor taken from the checkpoint (import_stofnet reports it in
    overrides) — a non-x4 checkpoint must decode in its own units."""
    from stofnet_tpu.ops import mask2coords

    up = overrides.get("upsample_factor", 4)

    def decode(heat):
        return mask2coords(heat, window_size=20, threshold=None,
                           upsample_factor=up, max_echoes=8)

    return decode


def make_xla_pipeline(overrides, dtype):
    import jax

    from stofnet_tpu.models import StofNet

    model = StofNet(dtype=dtype, **overrides)
    decode = make_decoder(overrides)

    @jax.jit
    def rf_to_tof(v, x):
        return decode(model.apply(v, x))

    return rf_to_tof


def try_packed_pipeline(variables, overrides, x, coords_ref):
    """The position-packed XLA path (ops/packed_conv.py): fills all 128 MXU
    output lanes for the Cout<=64 convs by computing 2 positions per matmul
    row, staying in the blocked layout across the whole conv stack. Math is
    identical up to accumulation order; gate on decoded-coord agreement.
    Measured on this backend it is within run-to-run noise of the plain XLA
    lowering (XLA's own conv tiling is already good); it is kept as a
    measured path so quiet-chip runs can pick whichever wins."""
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.models.fused import stofnet_apply_packed

    decode = make_decoder(overrides)

    @jax.jit
    def pipe(v, xb):
        return decode(stofnet_apply_packed(v, xb, dtype=jnp.bfloat16, pack=2,
                                           **overrides))

    try:
        # through fetch(): one transient relay fault must not silently drop
        # a measured path (the gate itself still degrades to None on a
        # terminal failure)
        cp = fetch(lambda: np.asarray(pipe(variables, x)),
                   "packed parity gate")
        agree = np.mean(np.abs(coords_ref - cp) <= 1.0)
        log(f"packed pipeline: coord agreement {agree:.4f}")
        return pipe if agree >= 0.99 else None
    except FetchTimeout:
        raise  # poisoned claim: escalate to the belt
    except Exception as e:
        log(f"packed pipeline failed ({type(e).__name__}: {str(e)[:120]})")
        return None


def try_int8_pipeline(variables, overrides, x, coords_ref,
                      stack_layers=None, eq_alpha=None, bias_correct=False,
                      tag="int8-sgb"):
    """The int8-SGB XLA path (models/int8.py): the SemiGlobalBlock's
    contract conv — the pipeline's entire gap over roofline (4.2 ms of
    10.3 at B=128: 2.6 ms HBM round-trip of the (B, L, 512) pre-pool
    tensor + 1.7 ms MXU) — runs s8xs8->s32 on the MXU's 2x int8 path with
    the pre-pool tensor requantized to int8 in the conv epilogue (half the
    bytes). Calibrated on the gate batch; gated on the same 0.99
    decoded-coord agreement as every other path (measured at the bf16
    floor on CPU, models/int8.py docstring). Tries the integer-conv
    lowering first, the shifted-s8-matmul fallback if the backend rejects
    it.

    ``stack_layers``/``eq_alpha`` additionally run the chosen k=7 stack
    convs on the s8 MXU path (partial-stack config from the CPU
    sensitivity sweep, INT8_STACK_LAYERS) — same gate, separate ``tag``.
    """
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.models.int8 import quantize_stofnet, stofnet_apply_int8

    decode = make_decoder(overrides)

    try:
        q = quantize_stofnet(variables, x, stack_layers=stack_layers,
                             eq_alpha=eq_alpha, bias_correct=bias_correct,
                             **overrides)
    except FetchTimeout:
        raise
    except Exception as e:  # noqa: BLE001
        log(f"int8 calibration ({tag}) failed "
            f"({type(e).__name__}: {str(e)[:120]})")
        return None

    for impl in ("conv", "dots"):
        # one jitted program per lowering: the decode (nms + top_k over the
        # (B, 1, 32000) heatmap) must be compiled WITH the forward, not
        # dispatched eagerly through the relay
        def make_pipe(_impl):
            @jax.jit
            def pipe(v, xb):
                return decode(stofnet_apply_int8(
                    q, xb, dtype=jnp.bfloat16, impl=_impl,
                    stack_layers=stack_layers, **overrides))

            return pipe

        pipe = make_pipe(impl)
        try:
            cq = fetch(lambda: np.asarray(pipe(variables, x)),
                       f"{tag} parity gate ({impl})")
            agree = np.mean(np.abs(coords_ref - cq) <= 1.0)
            log(f"{tag} pipeline ({impl}): coord agreement {agree:.4f}")
            if agree >= 0.99:
                return pipe
            return None  # agreement is impl-independent: don't retry
        except FetchTimeout:
            raise
        except Exception as e:  # noqa: BLE001
            log(f"{tag} pipeline ({impl}) failed "
                f"({type(e).__name__}: {str(e)[:120]})")
    return None


def try_fused_pipeline(variables, overrides, x, coords_ref):
    """Compile + parity-gate the Pallas path, retrying through Mosaic
    helper outages. Returns the jitted fn or None.

    r3 composition: the manual-DMA packed-pair SGB kernel
    (sgb_dma_kernel.py) + the plain XLA conv stack — the faster of the
    two Pallas compositions (15.0 vs 39.9 ms/batch, docs/DESIGN.md r3
    table), though still behind plain XLA (12.3) on this backend's
    kernel input path; measured every run, served only if it wins."""
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.models.fused import stofnet_apply_fused

    decode = make_decoder(overrides)

    @jax.jit
    def pipe_fused(v, xb):
        return decode(stofnet_apply_fused(v, xb, dtype=jnp.bfloat16,
                                          fused_stack=False, sgb_impl="dma",
                                          **overrides))

    for attempt in range(1, MOSAIC_RETRIES + 1):
        try:
            cf = np.asarray(pipe_fused(variables, x))
            agree = np.mean(np.abs(coords_ref - cf) <= 1.0)
            log(f"pallas fused pipeline: coord agreement {agree:.4f}")
            return pipe_fused if agree >= 0.99 else None
        except FetchTimeout:
            raise  # not a Mosaic outage: the claim is poisoned
        except Exception as e:
            log(f"pallas compile attempt {attempt}/{MOSAIC_RETRIES} failed "
                f"({type(e).__name__}: {str(e)[:120]})")
            if attempt < MOSAIC_RETRIES:
                time.sleep(MOSAIC_BACKOFF_S)
    return None


def sustained_wf_s(body_fn, variables, batch, k, length=LENGTH):
    """Throughput of k scanned batches from a device-resident staging
    buffer (the serving pattern: inputs land in HBM ahead of the stream;
    generating them is not the pipeline's work, so it happens outside the
    timed scan)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stage(key):
        xs = jax.random.normal(key, (k, batch, 1, length), jnp.float32)
        return xs / jnp.max(jnp.abs(xs), axis=-1, keepdims=True)

    @jax.jit
    def run(v, xs):
        def body(carry, xb):
            return carry, body_fn(v, xb)

        _, cs = jax.lax.scan(body, 0, xs)
        return cs

    xs = stage(jax.random.key(0))  # ~205 MB staged in HBM at the default
    fetch(lambda: np.asarray(run(variables, xs)),
          f"stream warmup B={batch}")  # compile + warm
    best = float("inf")
    ok = 0
    for i in range(3):  # best-of-3: relay/chip load varies +-20% run-to-run
        try:
            t0 = time.perf_counter()
            cs = np.asarray(run(variables, xs))
            dt = time.perf_counter() - t0
            if cs.shape != (k, batch, 8):
                # a deterministic pipeline regression, NOT a relay fault:
                # surface it immediately instead of burning 3 retries + a
                # process re-exec on something that can never recover
                # (ShapeRegression is not retried; JaxRuntimeError is)
                raise ShapeRegression(
                    f"pipeline output shape {cs.shape} != {(k, batch, 8)}")
            best = min(best, dt)
            ok += 1
        except ShapeRegression:
            raise
        except Exception as e:  # noqa: BLE001 - drop the iteration, keep best
            log(f"timed stream iteration {i + 1}/3 failed "
                f"({type(e).__name__}: {str(e)[:120]})")
            time.sleep(FETCH_BACKOFF_S)
    if not ok:
        raise RuntimeError(f"all timed stream iterations failed (B={batch})")
    return batch * k / best, best / k


def host_fed_wf_s(pipe, variables, batches, iters=10):
    """Serving number including host->device transfer through the relay:
    fresh host batches are device_put each call (one-deep pipelined) and
    decoded coords fetched. Relay round-trip (~140 ms/call) dominates; on
    directly-attached hardware this approaches the stream number."""
    import jax
    import jax.numpy as jnp

    def measure():
        np.asarray(pipe(variables, jnp.asarray(batches[0])))  # warm
        t0 = time.perf_counter()
        nxt = jax.device_put(jnp.asarray(batches[0]))
        for i in range(iters):
            cur = nxt
            if i + 1 < iters:
                nxt = jax.device_put(
                    jnp.asarray(batches[(i + 1) % len(batches)]))
            np.asarray(pipe(variables, cur))
        dt = time.perf_counter() - t0
        return BATCH * iters / dt

    return fetch(measure, "host-fed measurement")


def measure_mfu(pipe, variables, x, wf_s):
    from stofnet_tpu.utils.profiling import flops_estimate

    flops = flops_estimate(pipe, variables, x)
    if not flops or not np.isfinite(flops):
        return None, None
    flops_per_s = flops * (wf_s / BATCH)
    return flops / BATCH, 100.0 * flops_per_s / V5E_BF16_PEAK


def oom_demo():
    """B=2048, L=8k memory experiment: the XLA path must materialize the
    SGB's (B, L, 512) pre-pool tensor (16.8 GB bf16 > 16 GB HBM); the
    Pallas-fused SGB streams it through VMEM tiles."""
    import jax
    import jax.numpy as jnp

    variables, overrides = setup()
    big = 2048
    rng = np.random.default_rng(0)
    x = rng.standard_normal((big, 1, LENGTH)).astype(np.float32)
    x /= np.abs(x).max(axis=-1, keepdims=True)
    x = jnp.asarray(x)

    def failure_summary(e):
        import re

        msg = re.sub(r"\x1b\[[0-9;]*m", "", str(e))
        hits = [ln.strip() for ln in msg.splitlines()
                if re.search(r"(?i)ran out of memory|exceeded hbm", ln)]
        if not hits and re.search(
                r"(?i)failed.?precondition|unavailable|deadline"
                r"|timed?.?out|connection", msg):
            # a relay/claim fault, not a memory outcome: recording it as a
            # path result would fake the experiment — escalate to the
            # process-level respawn belt instead
            raise e
        return (f"{type(e).__name__}: " +
                ("; ".join(hits[:2]) if hits else msg[:200]))

    results = {}
    pipe_xla = make_xla_pipeline(overrides, jnp.bfloat16)
    try:
        c = np.asarray(pipe_xla(variables, x))
        results["xla_b2048"] = f"ok ({c.shape})"
    except Exception as e:
        results["xla_b2048"] = failure_summary(e)
    log(f"xla B={big}: {results['xla_b2048']}")

    decode = make_decoder(overrides)
    try:
        from stofnet_tpu.models.fused import stofnet_apply_fused

        @jax.jit
        def pipe_fused(v, xb):
            return decode(stofnet_apply_fused(v, xb, dtype=jnp.bfloat16,
                                              fused_stack=False, **overrides))

        c = np.asarray(pipe_fused(variables, x))
        t0 = time.perf_counter()
        c = np.asarray(pipe_fused(variables, x))
        ms = (time.perf_counter() - t0) * 1e3
        results["pallas_b2048"] = f"ok ({c.shape})"
        results["pallas_b2048_ms"] = round(ms, 1)
    except Exception as e:
        results["pallas_b2048"] = failure_summary(e)
    log(f"pallas B={big}: {results['pallas_b2048']}")

    # honesty key: micro-batched plain XLA (lax.map over 128-waveform
    # chunks) only ever materializes one chunk's (128, L, 512) pre-pool
    # tensor — the boring production answer to the inference cliff; the
    # fused kernel must beat THIS, not just the single-pass OOM
    try:
        @jax.jit
        def pipe_chunked(v, xb):
            chunks = xb.reshape((big // BATCH, BATCH) + xb.shape[1:])
            return jax.lax.map(lambda c: pipe_xla(v, c), chunks)

        c = np.asarray(pipe_chunked(variables, x))
        t0 = time.perf_counter()
        c = np.asarray(pipe_chunked(variables, x))
        ms = (time.perf_counter() - t0) * 1e3
        results["xla_chunked_b2048"] = f"ok ({c.reshape(big, -1).shape})"
        results["xla_chunked_b2048_ms"] = round(ms, 1)
    except Exception as e:
        results["xla_chunked_b2048"] = failure_summary(e)
    log(f"xla chunked B={big}: {results['xla_chunked_b2048']}")

    # int8-SGB XLA path: the s8 pre-pool tensor is 8.4 GB instead of bf16's
    # 16.8, so plain XLA may clear the memory cliff too (models/int8.py)
    try:
        from stofnet_tpu.models.int8 import (quantize_stofnet,
                                             stofnet_apply_int8)

        q = quantize_stofnet(variables, x[:32], **overrides)

        @jax.jit
        def pipe_int8(xb):
            return decode(stofnet_apply_int8(q, xb, dtype=jnp.bfloat16,
                                             **overrides))

        c = np.asarray(pipe_int8(x))
        results["int8_b2048"] = f"ok ({c.shape})"
    except Exception as e:
        results["int8_b2048"] = failure_summary(e)
    log(f"int8-sgb B={big}: {results['int8_b2048']}")

    results.update(oom_train_demo(variables, overrides, failure_summary))

    emit({"metric": "stofnet_b2048_memory_demo", "value": 1.0,
          "unit": "see extra keys", "vs_baseline": 1.0, **results},
         "oom-demo")


def oom_train_demo(variables, overrides, failure_summary):
    """TRAINING memory experiment (VERDICT r2 #6): the fused-SGB custom VJP
    (sgb_contract_pool_trainable) never materializes the (B, L, 512)
    pre-pool tensor in either pass, while XLA training must keep it as a
    backward residual. Walk batch sizes down from 2048; at each B try the
    XLA train step and the fused-VJP train step; stop at the first B the
    fused path trains at, recording both outcomes (+ fused ms/step)."""
    import jax
    import jax.numpy as jnp
    import optax

    from stofnet_tpu.models import StofNet
    from stofnet_tpu.models.fused import stofnet_apply_fused
    from stofnet_tpu.ops.gaussian import gaussian_kernel
    from stofnet_tpu.train.loss import heatmap_loss
    from stofnet_tpu.train.steps import (LossConfig, init_train_state,
                                         make_optimizer, make_train_step)

    cfg = LossConfig(upsample_factor=overrides.get("upsample_factor", 4),
                     max_echoes=8)
    kernel = gaussian_kernel(cfg.kernel_size, cfg.sigma)
    optimizer, _ = make_optimizer(steps_per_epoch=100)
    model = StofNet(dtype=jnp.bfloat16, **overrides)
    xla_step = make_train_step(model, optimizer, cfg)
    xla_step_remat = make_train_step(model, optimizer, cfg, remat=True)

    def loss_fn(params, frame, gt_true):
        pred = stofnet_apply_fused({"params": params}, frame,
                                   dtype=jnp.bfloat16, trainable=True,
                                   **overrides)
        loss, _ = heatmap_loss(pred, gt_true, kernel=kernel,
                               mask_amplitude=cfg.mask_amplitude,
                               lambda_value=cfg.lambda_value)
        return loss

    @jax.jit
    def fused_step(params, opt_state, frame, gt_true):
        loss, grads = jax.value_and_grad(loss_fn)(params, frame, gt_true)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    results = {}
    for bt in (2048, 1536, 1024, 768, 512):
        key = jax.random.key(bt)
        xb = jax.random.normal(key, (bt, 1, LENGTH), jnp.float32)
        xb = xb / jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
        gt_true = jnp.broadcast_to(
            jnp.asarray([[8000, 22000]], jnp.int32)[None], (bt, 1, 2))

        try:
            state = init_train_state(variables, optimizer)
            _, aux = xla_step(state, xb, jnp.zeros((bt, 2)), gt_true)
            loss = float(aux["loss"])
            results[f"xla_train_b{bt}"] = f"ok (loss {loss:.4f})"
        except Exception as e:
            results[f"xla_train_b{bt}"] = failure_summary(e)
        log(f"xla train B={bt}: {results[f'xla_train_b{bt}']}")

        if "ok" not in results[f"xla_train_b{bt}"]:
            # honesty key: gradient accumulation (train/steps.py accum=N,
            # 128-waveform micro-batches) is the plain-XLA production
            # answer to the same memory cliff — record whether it trains
            # at this batch and its step time
            try:
                acc = max(2, bt // 128)
                accum_step = make_train_step(model, optimizer, cfg,
                                             accum=acc)
                state = init_train_state(variables, optimizer)
                state, aux = accum_step(state, xb, jnp.zeros((bt, 2)),
                                        gt_true)
                loss = float(aux["loss"])  # compile + fetch-sync
                assert np.isfinite(loss), f"non-finite accum loss {loss}"
                t0 = time.perf_counter()
                state, aux = accum_step(state, xb, jnp.zeros((bt, 2)),
                                        gt_true)
                loss = float(aux["loss"])
                ms = (time.perf_counter() - t0) * 1e3
                results[f"xla_accum{acc}_train_b{bt}"] = (
                    f"ok (loss {loss:.4f})")
                results[f"xla_accum{acc}_train_b{bt}_ms_per_step"] = (
                    round(ms, 1))
                log(f"xla accum={acc} train B={bt}: ok, {ms:.1f} ms/step")
            except Exception as e:
                results[f"xla_accum{acc}_train_b{bt}"] = failure_summary(e)
                log(f"xla accum={acc} train B={bt}: "
                    f"{results[f'xla_accum{acc}_train_b{bt}']}")

        try:
            params = variables["params"]
            opt_state = optimizer.init(params)
            params, opt_state, loss = fused_step(params, opt_state, xb,
                                                 gt_true)
            loss = float(loss)
            assert np.isfinite(loss), f"non-finite fused train loss {loss}"
            t0 = time.perf_counter()
            for _ in range(3):
                params, opt_state, loss = fused_step(params, opt_state, xb,
                                                     gt_true)
            loss = float(loss)  # fetch-sync through the relay
            ms = (time.perf_counter() - t0) / 3 * 1e3
            results[f"pallas_train_b{bt}"] = f"ok (loss {loss:.4f})"
            results[f"pallas_train_b{bt}_ms_per_step"] = round(ms, 1)
            log(f"fused train B={bt}: ok, {ms:.1f} ms/step")
            # honesty key: does XLA fit at this batch WITH remat? (a user
            # would prefer that if it does and is faster)
            try:
                state = init_train_state(variables, optimizer)
                t0 = time.perf_counter()
                state, aux = xla_step_remat(state, xb, jnp.zeros((bt, 2)),
                                            gt_true)
                loss = float(aux["loss"])
                ms = (time.perf_counter() - t0) * 1e3
                results[f"xla_remat_train_b{bt}"] = (
                    f"ok (loss {loss:.4f}, first-step {ms:.0f} ms "
                    f"incl. compile)")
            except Exception as e:
                results[f"xla_remat_train_b{bt}"] = failure_summary(e)
            log(f"xla remat train B={bt}: "
                f"{results[f'xla_remat_train_b{bt}']}")
            break  # largest fused-trainable batch found
        except Exception as e:
            results[f"pallas_train_b{bt}"] = failure_summary(e)
            log(f"fused train B={bt}: {results[f'pallas_train_b{bt}']}")
    return results


def make_int8_curve_pipeline(variables, overrides, who: str):
    """int8-SGB pipeline for the scaling curves, or None if unavailable.

    Calibrates ONCE on the B=128 echo gate batch (weight scales are
    per-cout, activation scales per-waveform/dynamic — models/int8.py —
    so the quantized program is shape-independent) and keeps the
    headline's lowering fallback: the integer-conv path first, the
    shifted-s8-matmul ("dots") path if the backend rejects it (probed
    with one tiny fetch per impl). Quality gating stays the headline
    run's job; the curves measure throughput of the path it serves.
    """
    import jax
    import jax.numpy as jnp

    try:
        from stofnet_tpu.models.int8 import (quantize_stofnet,
                                             stofnet_apply_int8)

        rng = np.random.default_rng(7)
        gate = jnp.asarray(make_gate_batch(BATCH, LENGTH, rng))
        q = quantize_stofnet(variables, gate, **overrides)
        decode = make_decoder(overrides)
    except FetchTimeout:
        raise
    except Exception as e:  # noqa: BLE001
        log(f"int8 calibration unavailable for {who} ({type(e).__name__})")
        return None

    for impl in ("conv", "dots"):
        def make_pipe(_impl):
            @jax.jit
            def pipe(v, xb):
                return decode(stofnet_apply_int8(
                    q, xb, dtype=jnp.bfloat16, impl=_impl, **overrides))

            return pipe

        pipe = make_pipe(impl)
        try:
            fetch(lambda: np.asarray(pipe(variables, gate[:8])),
                  f"int8 {impl} probe ({who})")
            log(f"int8 path for {who}: impl={impl}")
            return pipe
        except FetchTimeout:
            raise
        except Exception as e:  # noqa: BLE001
            log(f"int8 impl={impl} rejected for {who} "
                f"({type(e).__name__}: {str(e)[:80]})")
    return None


def length_scaling() -> None:
    """Throughput vs waveform length L at fixed total samples per batch
    (B*L const): the single-chip long-sequence story. The SemiGlobalBlock's
    80x pooled pathway gives O(L/80) global context at any L, so sample
    rate should hold roughly flat until HBM pressure bites; multi-chip
    length sharding (parallel/, sp axis) extends past that."""
    import jax
    import jax.numpy as jnp

    variables, overrides = setup()
    pipe = make_xla_pipeline(overrides, jnp.bfloat16)

    # int8-SGB path, calibrated once at the headline L (weight scales are
    # per-cout and the activation scales are per-waveform/dynamic, so the
    # quantized program is shape-independent — same reasoning as scaling())
    pipe_int8 = make_int8_curve_pipeline(variables, overrides, "lscaling")

    curve = {}
    total = 128 * 8000  # the headline operating point's samples/batch
    for length in (8000, 16000, 40000, 80000, 160000):
        batch = max(1, total // length)
        k = 16
        for tag, p in (("", pipe), ("int8_", pipe_int8)):
            if p is None:
                continue
            try:
                wf_s, dt = sustained_wf_s(p, variables, batch, k,
                                          length=length)
                sps = wf_s * length
                curve[f"{tag}L{length}"] = round(sps / 1e6, 1)
                log(f"{tag or 'xla_'}L={length} B={batch} k={k}: "
                    f"{dt * 1e3:.2f} ms/batch -> {wf_s:.1f} wf/s = "
                    f"{sps / 1e6:.1f} Msamples/s")
            except FetchTimeout:
                raise  # poisoned claim: escalate, don't burn 720 s/point
            except Exception as e:
                curve[f"{tag}L{length}"] = f"{type(e).__name__}"
                log(f"{tag or 'xla_'}L={length}: {type(e).__name__}: "
                    f"{str(e)[:100]}")
    emit({"metric": "stofnet_length_scaling", "value": 1.0,
          "unit": "Msamples/s/chip per waveform length",
          "vs_baseline": 1.0, **curve}, "lscaling")


def train_bench() -> None:
    """Sustained TRAINING throughput on one chip: the full jitted train
    step (forward + blurred-mask loss + backward + AdamW update, the
    reference recipe main.py:198-289) scanned over device-resident batches.
    The reference trains at ~7 wf/s-scale on GPU-hours; this prints the
    TPU wf/s and steps/s at the benchmark operating shape."""
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.train.steps import (LossConfig, init_train_state,
                                         make_optimizer, make_train_step)

    variables, overrides = setup()

    from stofnet_tpu.models import StofNet

    model = StofNet(**overrides)  # dtype=None: amp decides the precision
    cfg = LossConfig(upsample_factor=overrides.get("upsample_factor", 4),
                     max_echoes=8)
    optimizer, _ = make_optimizer(lr=5e-4, weight_decay=1e-8, epochs=80,
                                  steps_per_epoch=100)

    k = 20
    key = jax.random.key(0)
    xs = jax.random.normal(key, (k, BATCH, 1, LENGTH), jnp.float32)
    xs = xs / jnp.max(jnp.abs(xs), axis=-1, keepdims=True)
    # synthetic GT: 2 echoes per waveform (static (B, E) layout, 0 = unused;
    # gt_true is (B, 1, E) in upsampled units, cli/main.py:443 semantics)
    gt = jnp.stack([jnp.full((BATCH,), 2000.25), jnp.full((BATCH,), 5500.5)],
                   -1)
    gt = jnp.broadcast_to(gt, (k, BATCH, 2))
    gt_true = jnp.round(gt[:, :, None, :] * cfg.upsample_factor
                        ).astype(jnp.int32)

    def measure(amp: bool):
        """best-of-3 ms/step for one precision recipe (f32 parity vs
        bf16-AMP with f32 master weights, train/steps.py make_train_step)."""
        train_step = make_train_step(model, optimizer, cfg, amp=amp)
        state = init_train_state(variables, optimizer, seed=0)

        @jax.jit
        def run_steps(state, xs, gt, gt_true):
            def body(st, inp):
                xb, g, gtr = inp
                st, aux = train_step(st, xb, g, gtr)
                return st, aux["loss"]

            return jax.lax.scan(body, state, (xs, gt, gt_true))

        _, losses = run_steps(state, xs, gt, gt_true)
        losses = fetch(lambda: np.asarray(losses),
                       f"train warmup amp={amp}")  # compile + warm + sync
        best = float("inf")
        ok = 0
        for i in range(3):  # same per-iteration tolerance as sustained_wf_s
            try:
                t0 = time.perf_counter()
                _, ls = run_steps(state, xs, gt, gt_true)
                np.asarray(ls)
                best = min(best, time.perf_counter() - t0)
                ok += 1
            except Exception as e:  # noqa: BLE001 - drop iteration, keep best
                log(f"train timing iteration {i + 1}/3 (amp={amp}) failed "
                    f"({type(e).__name__}: {str(e)[:120]})")
                time.sleep(FETCH_BACKOFF_S)
        if not ok:
            raise RuntimeError(f"all train timing iterations failed "
                               f"(amp={amp})")
        assert np.isfinite(losses).all()
        wf_s = BATCH * k / best
        log(f"train step amp={amp} B={BATCH} k={k}: "
            f"{best / k * 1e3:.2f} ms/step -> {wf_s:.1f} wf/s, "
            f"loss[0]={losses[0]:.4f} -> loss[-1]={losses[-1]:.4f}")
        return wf_s, best / k * 1e3

    def step_flops():
        """XLA cost analysis of ONE jitted train step (fwd + bwd + AdamW)
        — the training-side MFU honesty the inference headline already
        has (measure_mfu / docs/DESIGN.md). Analysis runs on the lowered
        step itself, not the scan, so the FLOPs are per-step exactly.
        ONE compile serves both recipes: the f32 and amp steps carry the
        same op graph modulo dtype, and their cost analyses measured
        equal to 0.04% (2982.3 vs 2981.2 GFLOP, 2026-08-20) — not worth
        a second ~30 s relay compile (review finding r5)."""
        from stofnet_tpu.utils.profiling import flops_estimate

        train_step = make_train_step(model, optimizer, cfg, amp=True)
        state = init_train_state(variables, optimizer, seed=0)
        return flops_estimate(train_step, state, xs[0], gt[0], gt_true[0])

    f32_wf_s, f32_ms = measure(amp=False)   # the reference parity recipe
    amp_wf_s, amp_ms = measure(amp=True)    # bf16 compute, f32 master
    wf_s, ms, recipe = ((amp_wf_s, amp_ms, "amp")
                        if amp_wf_s >= f32_wf_s else (f32_wf_s, f32_ms, "f32"))
    mfu = {}
    fl = step_flops()
    if fl and np.isfinite(fl):
        for name, s_ms in (("f32", f32_ms), ("amp", amp_ms)):
            # vs the bf16 systolic peak in BOTH recipes (the codebase
            # convention; the f32 recipe's convs run below that peak by
            # construction, which is part of what the number shows)
            mfu[name] = {"flops_per_step": fl,
                         "mfu_pct": round(100.0 * fl / (s_ms / 1e3)
                                          / V5E_BF16_PEAK, 1)}
            log(f"train {name}: {fl / 1e9:.1f} GFLOP/step -> "
                f"{mfu[name]['mfu_pct']}% of v5e bf16 peak")
    emit({
        "metric": "stofnet_train_throughput",
        "value": round(wf_s, 1),
        "unit": f"waveforms/s/chip training (B={BATCH}, L={LENGTH}, "
                "fwd+bwd+AdamW)",
        "vs_baseline": round(wf_s / BASELINE_WF_S, 2),
        "ms_per_step": round(ms, 2),
        "recipe": recipe,
        "train_f32_wf_s": round(f32_wf_s, 1),
        "train_amp_wf_s": round(amp_wf_s, 1),
        "train_f32_mfu_pct": mfu.get("f32", {}).get("mfu_pct"),
        "train_amp_mfu_pct": mfu.get("amp", {}).get("mfu_pct"),
        "train_flops_per_step": mfu.get("amp", mfu.get("f32", {}))
                                   .get("flops_per_step"),
    }, "train")


def scaling() -> None:
    """Throughput vs batch size: bf16 XLA pipeline AND the int8-SGB
    serving path (the headline's served path since r3).

    int8 calibration happens ONCE on the B=128 echo gate batch —
    activation scales are per-waveform/dynamic (models/int8.py), so the
    quantized program is batch-size independent, and the headline run
    already coordinate-gates this path at B=128; the curve here measures
    throughput only.
    """
    import jax
    import jax.numpy as jnp

    variables, overrides = setup()
    pipe = make_xla_pipeline(overrides, jnp.bfloat16)

    pipe_int8 = make_int8_curve_pipeline(variables, overrides, "scaling")

    curve = {}
    for batch in (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024):
        k = max(8, min(50, 4096 // batch))
        for tag, p in (("", pipe), ("int8_", pipe_int8)):
            if p is None:
                continue
            try:
                wf_s, dt = sustained_wf_s(p, variables, batch, k)
                curve[f"{tag}b{batch}"] = round(wf_s, 1)
                log(f"{tag or 'xla_'}B={batch} k={k}: "
                    f"{dt * 1e3:.2f} ms/batch -> {wf_s:.1f} wf/s")
            except FetchTimeout:
                raise  # poisoned claim: escalate, don't burn 720 s/point
            except Exception as e:
                curve[f"{tag}b{batch}"] = f"{type(e).__name__}"
                log(f"{tag or 'xla_'}B={batch}: {type(e).__name__}")
    emit({"metric": "stofnet_throughput_scaling", "value": 1.0,
          "unit": "waveforms/s/chip per batch size",
          "vs_baseline": 1.0, **curve}, "scaling")


def _host_pipeline(pipe, variables, bf16_leg: bool):
    """ServingHost-facing callable for --serve/--soak: numpy (B, 1, L)
    in, coords out. With ``bf16_leg`` the batch ships to the device as
    its RNE bf16 cast — bit-identical to what the bf16 pipeline's first
    op computes from f32 input (so decode-lossless by construction) at
    HALF the per-dispatch relay bytes (the host->device transfer is the
    measured serving ceiling; docs/SERVE_BATCHED_tpu.md measured the
    bf16 device leg at +50%/call on the encoded-input artifacts)."""
    import jax.numpy as jnp

    if not bf16_leg:
        def pipeline(xb):
            return pipe(variables, jnp.asarray(xb))

        return pipeline
    import ml_dtypes

    def pipeline(xb):
        xb16 = np.asarray(xb, np.float32).astype(ml_dtypes.bfloat16)
        return pipe(variables, jnp.asarray(xb16))

    return pipeline


def serve_bench() -> None:
    """Serving-stack benchmark: the dynamic-batching host
    (stofnet_tpu/serving) under closed-loop single-waveform clients — the
    production path where requests arrive one waveform at a time and the
    host coalesces them into bucketed device batches. Reports, per load
    point (1 / 8 / 128 concurrent clients): sustained waveforms/s, the
    client-observed p50/p99 latency, and batch occupancy. The 1-client
    point is the latency floor (chip B=1 latency + max_wait); the
    128-client point should approach the streamed B=128 throughput minus
    host/fan-out overhead. Follows the mode conventions: setup()'s
    watchdogged first contact catches a start-of-run outage; a mid-run
    stall is detected by zero progress and raised as FetchTimeout."""
    import threading

    import jax.numpy as jnp

    from stofnet_tpu.serving import ServingHost

    variables, overrides = setup()
    rng = np.random.default_rng(3008)
    x = jnp.asarray(make_gate_batch(BATCH, LENGTH, rng))

    # same bf16 gate as the headline: serve the shipping dtype only if it
    # reproduces f32 coords on a real (in-distribution, echo-bearing) batch
    pipe_f32 = make_xla_pipeline(overrides, None)
    pipe_bf16 = make_xla_pipeline(overrides, jnp.bfloat16)
    c32 = fetch(lambda: np.asarray(pipe_f32(variables, x)), "f32 parity gate")
    c16 = fetch(lambda: np.asarray(pipe_bf16(variables, x)),
                "bf16 parity gate")
    agree = np.mean(np.abs(c32 - c16) <= 1.0)
    pipe = pipe_bf16 if agree >= 0.99 else pipe_f32
    log(f"bf16/f32 coord agreement: {agree:.4f} -> serving "
        f"{'bf16' if agree >= 0.99 else 'f32'}")
    # host calls with np (B,1,L); fetch synchronizes. When bf16 ships,
    # the host->device leg ships the RNE bf16 CAST of the batch — the
    # identical cast the pipeline's first op performs, so it is lossless
    # by construction, and it halves the per-dispatch relay transfer
    # (measured +50%/call on the encoded-input artifacts,
    # docs/SERVE_BATCHED_tpu.md)
    pipeline = _host_pipeline(pipe, variables, bf16_leg=agree >= 0.99)

    host = ServingHost(pipeline, LENGTH, max_batch=BATCH, max_wait_ms=2.0)
    for b in host.stats()["bucket_counts"]:
        fetch(lambda b=b: host.warmup([b]), f"warmup bucket {b}")

    waves = [np.asarray(x[i % BATCH, 0]) for i in range(128)]

    def run_load(clients: int, seconds: float) -> dict:
        stop = threading.Event()
        errors: list = []

        def client(i: int) -> None:
            w = waves[i]
            while not stop.is_set():
                try:
                    host.infer(w, timeout=FETCH_TIMEOUT_S)
                except Exception as e:  # noqa: BLE001 - surfaced below
                    errors.append(e)
                    stop.set()
                    return

        threads = [threading.Thread(target=client, args=(i,), daemon=True)
                   for i in range(clients)]
        for t in threads:
            t.start()
        ramp_until = time.perf_counter() + 60.0
        base = host.stats()["waveforms"]
        while (host.stats()["waveforms"] < base + 2 * clients
               and time.perf_counter() < ramp_until and not stop.is_set()):
            time.sleep(0.05)
        s0, t0 = host.stats(), time.perf_counter()
        while time.perf_counter() < t0 + seconds and not stop.is_set():
            time.sleep(0.1)
        s1, t1 = host.stats(), time.perf_counter()
        stop.set()
        for t in threads:
            t.join(30.0)
        if errors:
            raise errors[0]
        done = s1["waveforms"] - s0["waveforms"]
        if done == 0:
            raise FetchTimeout(f"serving load ({clients} clients) made no "
                               f"progress in {seconds:.0f}s")
        padded = max(1, s1["padded"] - s0["padded"])
        point = {
            "wf_s": round(done / (t1 - t0), 1),
            "p50_ms": round(s1.get("latency_p50_ms", 0.0), 2),
            "p99_ms": round(s1.get("latency_p99_ms", 0.0), 2),
            "occupancy": round(done / padded, 3),
        }
        log(f"serve load {clients} clients: {point}")
        return point

    points = {c: run_load(c, 10.0) for c in (1, 8, 128)}
    host.close()
    sat = points[128]
    emit({
        "metric": "stofnet_serving_throughput",
        "value": sat["wf_s"],
        "unit": "waveforms/s/chip (dynamic batching host, 128 closed-loop "
                "single-waveform clients, L=8000)",
        "vs_baseline": round(sat["wf_s"] / BASELINE_WF_S, 2),
        "serve_p50_ms": sat["p50_ms"],
        "serve_p99_ms": sat["p99_ms"],
        "serve_occupancy": sat["occupancy"],
        "serve_1client_wf_s": points[1]["wf_s"],
        "serve_1client_p50_ms": points[1]["p50_ms"],
        "serve_8client_wf_s": points[8]["wf_s"],
        "serve_8client_p50_ms": points[8]["p50_ms"],
    }, "serve")


def serve_soak() -> None:
    """10-minute sustained serving soak: 32 closed-loop single-waveform
    clients against the dynamic-batching host, per-minute throughput
    windows. What the 10 s load points (--serve) can't show: throughput
    drift under sustained relay/chip load, transient client errors (a
    relay hiccup mid-soak should cost one request a retry, not the run),
    and a clean drain after ~10 minutes of continuous dispatch. Clients
    retry on error (counted, budgeted); a zero-progress window raises
    FetchTimeout (relay gone, not drift).

    ``STOFNET_SOAK_MINUTES`` / ``STOFNET_SOAK_CLIENTS`` override the
    duration/load for CPU contract runs.
    """
    import threading

    import jax.numpy as jnp

    from stofnet_tpu.serving import ServingHost

    minutes = int(os.environ.get("STOFNET_SOAK_MINUTES", "10"))
    clients_n = int(os.environ.get("STOFNET_SOAK_CLIENTS", "32"))
    err_budget = 50

    variables, overrides = setup()
    rng = np.random.default_rng(3008)
    x = jnp.asarray(make_gate_batch(BATCH, LENGTH, rng))

    # same dtype gate as --serve: soak whatever would actually ship
    pipe_f32 = make_xla_pipeline(overrides, None)
    pipe_bf16 = make_xla_pipeline(overrides, jnp.bfloat16)
    c32 = fetch(lambda: np.asarray(pipe_f32(variables, x)), "f32 parity gate")
    c16 = fetch(lambda: np.asarray(pipe_bf16(variables, x)),
                "bf16 parity gate")
    agree = np.mean(np.abs(c32 - c16) <= 1.0)
    pipe = pipe_bf16 if agree >= 0.99 else pipe_f32
    log(f"bf16/f32 coord agreement: {agree:.4f} -> soaking "
        f"{'bf16' if agree >= 0.99 else 'f32'}")
    # bf16 host->device leg when bf16 ships (lossless; see serve_bench)
    pipeline = _host_pipeline(pipe, variables, bf16_leg=agree >= 0.99)

    host = ServingHost(pipeline, LENGTH, max_batch=BATCH, max_wait_ms=2.0)
    for b in host.stats()["bucket_counts"]:
        fetch(lambda b=b: host.warmup([b]), f"warmup bucket {b}")

    waves = [np.asarray(x[i % BATCH, 0]) for i in range(clients_n)]
    stop = threading.Event()
    errors: list = []

    def client(i: int) -> None:
        w = waves[i]
        while not stop.is_set():
            try:
                host.infer(w, timeout=FETCH_TIMEOUT_S)
            except Exception as e:  # noqa: BLE001 - budgeted + reported
                errors.append(f"{type(e).__name__}: {str(e)[:60]}")
                if len(errors) > err_budget:
                    stop.set()
                    return
                time.sleep(1.0)  # back off, then rejoin the load

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients_n)]
    for t in threads:
        t.start()

    windows = []
    win_disp_ms, win_occ = [], []  # per-window device ms/batch, occupancy
    snap = host.stats()
    prev = snap["waveforms"]
    prev_disp, prev_batches = snap["dispatch_time_s"], snap["batches"]
    prev_padded = snap["padded"]
    for m in range(minutes):
        t0 = time.perf_counter()
        while time.perf_counter() < t0 + 60.0 and not stop.is_set():
            time.sleep(0.5)
        dt = time.perf_counter() - t0
        snap = host.stats()
        cur = snap["waveforms"]
        # budget check FIRST: a deterministic serving bug blows the error
        # budget within one window and must keep rc=1 (RuntimeError is not
        # _relay_shaped) — only an error-free stall is relay-shaped
        if len(errors) > err_budget:
            stop.set()
            raise RuntimeError(f"soak exceeded the error budget: "
                               f"{errors[-3:]} (x{len(errors)})")
        if cur == prev:
            stop.set()
            raise FetchTimeout(f"soak window {m + 1} made no progress "
                               f"({len(errors)} client errors)")
        windows.append(round((cur - prev) / dt, 1))
        # per-window DEVICE-call time (queue wait excluded) + occupancy:
        # the sag-attribution instrumentation VERDICT r3 #2 asked for — a
        # sagging window with RISING device ms/batch is relay/chip-side;
        # flat device time with falling wf/s is host/client-side
        d_batches = snap["batches"] - prev_batches
        win_disp_ms.append(round(
            1e3 * (snap["dispatch_time_s"] - prev_disp) / max(d_batches, 1),
            2))
        d_padded = snap["padded"] - prev_padded
        win_occ.append(round((cur - prev) / d_padded, 3) if d_padded else 0.0)
        log(f"soak window {m + 1}/{minutes}: {windows[-1]:.1f} wf/s, "
            f"device {win_disp_ms[-1]:.1f} ms/batch over {d_batches} "
            f"batches, occupancy {win_occ[-1]:.3f} "
            f"({len(errors)} errors so far)")
        prev, prev_disp = cur, snap["dispatch_time_s"]
        prev_batches, prev_padded = snap["batches"], snap["padded"]
        if stop.is_set():
            break

    stop.set()
    for t in threads:
        t.join(30.0)
    if len(errors) > err_budget:
        raise RuntimeError(f"soak exceeded the error budget: "
                           f"{errors[-3:]} (x{len(errors)})")
    s = host.stats()
    host.close()  # drain must complete without raising
    emit({
        "metric": "stofnet_serving_soak",
        "value": round(float(np.mean(windows)), 1),
        "unit": f"waveforms/s/chip sustained over {len(windows)} min "
                f"({clients_n} closed-loop clients, L={LENGTH})",
        "vs_baseline": round(float(np.mean(windows)) / BASELINE_WF_S, 2),
        "soak_windows_wf_s": windows,
        "soak_window_dispatch_ms": win_disp_ms,
        "soak_window_occupancy": win_occ,
        "soak_drift": round(windows[-1] / windows[0], 3) if windows else None,
        "soak_client_errors": len(errors),
        "soak_p50_ms": round(s.get("latency_p50_ms", 0.0), 2),
        "soak_p99_ms": round(s.get("latency_p99_ms", 0.0), 2),
        "soak_occupancy": round(s.get("occupancy", 0.0), 3),
        "soak_drained_clean": True,
    }, "soak")


def main() -> None:
    import jax.numpy as jnp

    variables, overrides = setup()
    rng = np.random.default_rng(3008)

    def make_input(batch):
        x = rng.standard_normal((batch, 1, LENGTH)).astype(np.float32)
        x /= np.abs(x).max(axis=-1, keepdims=True)
        return x

    # gate (and int8-calibration) batch: in-distribution single-echo
    # waveforms — see make_gate_batch for why noise draws gated on
    # tie-breaking luck instead of localization
    x = jnp.asarray(make_gate_batch(BATCH, LENGTH, rng))

    # decode-parity gate: bf16 must reproduce f32 ToA coords on this batch
    pipe_f32 = make_xla_pipeline(overrides, None)
    pipe_bf16 = make_xla_pipeline(overrides, jnp.bfloat16)
    c32 = fetch(lambda: np.asarray(pipe_f32(variables, x)),
                "f32 parity gate")  # r2's bench died unretried on this line
    c16 = fetch(lambda: np.asarray(pipe_bf16(variables, x)),
                "bf16 parity gate")
    agree = np.mean(np.abs(c32 - c16) <= 1.0)
    use_bf16 = bool(agree >= 0.99)
    log(f"bf16/f32 coord agreement: {agree:.4f} -> using "
        f"{'bf16' if use_bf16 else 'f32'}")
    pipe_xla = pipe_bf16 if use_bf16 else pipe_f32

    # per-call latency through the relay (harness-bound, stderr only)
    try:
        np.asarray(pipe_xla(variables, x))
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(pipe_xla(variables, x))
        log(f"per-call latency B={BATCH} (relay-bound): "
            f"{(time.perf_counter() - t0) / 5 * 1e3:.1f} ms")
    except Exception as e:  # noqa: BLE001 - stderr-only number, never fatal
        log(f"per-call latency probe failed ({type(e).__name__}); skipping")

    wf_xla, dt = sustained_wf_s(pipe_xla, variables, BATCH, 50)
    log(f"stream B={BATCH} k=50 (xla): {dt * 1e3:.2f} ms/batch "
        f"-> {wf_xla:.1f} wf/s")

    # position-packed XLA path (full MXU lane utilization for Cout<=64)
    wf_packed = None
    pipe_packed = (try_packed_pipeline(variables, overrides, x, c32)
                   if (overrides and use_bf16) else None)
    if pipe_packed is not None:
        try:
            wf_packed, dtp = sustained_wf_s(pipe_packed, variables, BATCH, 50)
            log(f"stream B={BATCH} k=50 (packed): {dtp * 1e3:.2f} ms/batch "
                f"-> {wf_packed:.1f} wf/s")
        except FetchTimeout:
            raise
        except Exception:
            log("packed stream failed; xla path stands")

    # int8-SGB path (the MXU s8 lowering of the pipeline's dominant block)
    wf_int8 = None
    pipe_int8 = (try_int8_pipeline(variables, overrides, x, c32)
                 if (overrides and use_bf16
                     and overrides.get("semi_global_scale", 80) != 1)
                 else None)
    if pipe_int8 is not None:
        try:
            wf_int8, dti = sustained_wf_s(pipe_int8, variables, BATCH, 50)
            log(f"stream B={BATCH} k=50 (int8-sgb): {dti * 1e3:.2f} ms/batch "
                f"-> {wf_int8:.1f} wf/s")
        except FetchTimeout:
            raise
        except Exception:
            log("int8-sgb stream failed; xla path stands")

    # partial-stack int8 path: the sweep-chosen subset of the k=7 stack
    # convs additionally on the s8 MXU path (INT8_STACK_LAYERS); tried only
    # when the base int8-SGB path gated on (the stack config strictly adds
    # rounding on top of it, so a failed base gate makes this a lost cause)
    wf_int8stack = None
    if pipe_int8 is not None and INT8_STACK_LAYERS:
        pipe_int8stack = try_int8_pipeline(
            variables, overrides, x, c32, stack_layers=INT8_STACK_LAYERS,
            eq_alpha=INT8_STACK_ALPHA, bias_correct=INT8_STACK_BC,
            tag="int8-stack")
        if pipe_int8stack is not None:
            try:
                wf_int8stack, dts = sustained_wf_s(pipe_int8stack, variables,
                                                   BATCH, 50)
                log(f"stream B={BATCH} k=50 (int8-stack): "
                    f"{dts * 1e3:.2f} ms/batch -> {wf_int8stack:.1f} wf/s")
            except FetchTimeout:
                raise
            except Exception:
                log("int8-stack stream failed; faster gated path stands")

    # Pallas path, measured alongside (exact per tests/test_pallas_kernels.py)
    wf_fused = None
    pipe_fused = (try_fused_pipeline(variables, overrides, x, c32)
                  if (overrides and use_bf16) else None)
    if pipe_fused is not None:
        try:
            wf_fused, dtf = sustained_wf_s(pipe_fused, variables, BATCH, 50)
            log(f"stream B={BATCH} k=50 (pallas-fused): {dtf * 1e3:.2f} "
                f"ms/batch -> {wf_fused:.1f} wf/s")
        except FetchTimeout:
            raise
        except Exception as e:
            log(f"fused stream failed ({type(e).__name__}); xla path stands")

    candidates = {"xla": wf_xla}
    if wf_packed is not None:
        candidates["xla-packed"] = wf_packed
    if wf_int8 is not None:
        candidates["xla-int8sgb"] = wf_int8
    if wf_int8stack is not None:
        candidates["xla-int8stack"] = wf_int8stack
    if wf_fused is not None:
        candidates["pallas-fused"] = wf_fused
    best_path = max(candidates, key=candidates.get)
    wf_s = candidates[best_path]

    flops_per_wf, mfu = measure_mfu(pipe_xla, variables, x, wf_s)
    if mfu is not None:
        log(f"XLA cost analysis: {flops_per_wf / 1e9:.2f} GFLOP/waveform -> "
            f"{mfu:.1f}% MFU of v5e bf16 peak")

    try:
        wf_host = host_fed_wf_s(pipe_xla, variables,
                                [make_input(BATCH) for _ in range(4)])
        log(f"host-fed B={BATCH} (incl. relay transfer): {wf_host:.1f} wf/s")
    except FetchTimeout:
        raise
    except Exception as e:  # noqa: BLE001 - least important key; keep headline
        log(f"host-fed measurement failed after retries "
            f"({type(e).__name__}); reporting null")
        wf_host = None

    emit({
        "metric": "stofnet_rf_to_tof_throughput",
        "value": round(wf_s, 1),
        "unit": "waveforms/s/chip (B=128, L=8000, x4, fused decode)",
        "vs_baseline": round(wf_s / BASELINE_WF_S, 2),
        "path": best_path,
        "xla_wf_s": round(wf_xla, 1),
        "packed_wf_s": round(wf_packed, 1) if wf_packed else None,
        "int8_wf_s": round(wf_int8, 1) if wf_int8 else None,
        "int8stack_wf_s": round(wf_int8stack, 1) if wf_int8stack else None,
        "pallas_wf_s": round(wf_fused, 1) if wf_fused else None,
        "host_fed_wf_s": round(wf_host, 1) if wf_host else None,
        "mfu_pct": round(mfu, 1) if mfu is not None else None,
        "gflop_per_waveform": round(flops_per_wf / 1e9, 2)
        if flops_per_wf else None,
    }, "headline")


if __name__ == "__main__":
    if "--oom-demo" in sys.argv:
        respawn_on_failure(oom_demo, "oom-demo")
    elif "--scaling" in sys.argv:
        respawn_on_failure(scaling, "scaling")
    elif "--train" in sys.argv:
        respawn_on_failure(train_bench, "train")
    elif "--lscaling" in sys.argv:
        respawn_on_failure(length_scaling, "lscaling")
    elif "--serve" in sys.argv:
        respawn_on_failure(serve_bench, "serve")
    elif "--soak" in sys.argv:
        respawn_on_failure(serve_soak, "soak")
    else:
        respawn_on_failure(main, "headline")
