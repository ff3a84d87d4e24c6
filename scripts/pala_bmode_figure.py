"""End-to-end PALA imaging artifact: synthetic RF ensemble -> SVD clutter
filter -> DAS beamform (batched MXU path) -> B-mode figure with GT
scatterer overlay.

The reference's imaging consumers live in the absent pala_dataset
submodule (utils/beamform.py + utils/svd_filter.py are the in-tree
capabilities, SURVEY 2.21/2.22); this script demonstrates the rebuilt
pipeline end to end on hardware and saves docs/PALA_bmode.png.

Figure conventions: sequential magnitude -> single-hue grayscale dB map
(the B-mode standard); ground truth as open accent-colored circles with a
legend; labels/ticks in neutral ink.

Usage: python scripts/pala_bmode_figure.py [out.png]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stofnet_tpu.data.pala import PalaDatasetRf, generate_pala_dataset
    from stofnet_tpu.ops.beamform import BeamformParams, bf_das_batch
    from stofnet_tpu.ops.hilbert import analytic_signal
    from stofnet_tpu.ops.svd_filter import svd_filter

    out = Path(sys.argv[1] if len(sys.argv) > 1 else "docs/PALA_bmode.png")

    with tempfile.TemporaryDirectory() as td:
        root = Path(td) / "pala_synth"
        generate_pala_dataset(root, n_sequences=1, n_frames=24, n_targets=3,
                              n_channels=128, n_samples=1024)
        ds = PalaDatasetRf(root, sequences=[0], rescale_factor=1, ch_gap=1)

        xe = np.asarray(ds.get_key("xe"))
        params = BeamformParams(
            xe=xe, c=float(ds.get_key("c")), fs=float(ds.get_key("fs")),
            t0=float(ds.get_key("t0")), f0=float(ds.get_key("f0")),
            angles_list=np.asarray(ds.get_key("angles_list")),
        )
        # image grid: lateral = aperture; axial window = the generator's
        # target band (0.15-0.6 of its one-way reachable depth)
        zmax = 0.8 * 1024 / params.fs * params.c
        gx = np.linspace(xe[0], xe[-1], 128)
        gz = np.linspace(0.10 * zmax, 0.65 * zmax, 192)

        # frames: (F, angles, C, L) -> clutter-filter the ensemble per
        # (angle, channel) slow-time stack, then beamform every frame
        frames = np.stack([np.asarray(ds[i][0]) for i in range(len(ds))])
        f, a, c, l = frames.shape
        ens = np.transpose(frames, (1, 2, 3, 0)).reshape(a * c, l, f)
        filt = np.asarray(svd_filter(jnp.asarray(ens), lo_cut=2))
        frames = np.transpose(filt.reshape(a, c, l, f),
                              (3, 0, 2, 1))  # (F, angles, L, C)

        # envelope B-mode: analytic signal on device (complex stays under
        # jit — the relay can't transfer complex), IQ-path beamforming with
        # carrier phase rotation, log-compressed dB image out (real)
        @jax.jit
        def image(fr):
            return bf_das_batch(analytic_signal(fr, axis=2), params, gx, gz)

        frames_d = jnp.asarray(frames)
        bmodes = np.asarray(image(frames_d))  # + compile
        t0 = time.perf_counter()
        bmodes = np.asarray(image(frames_d))
        dt = time.perf_counter() - t0
        print(f"beamformed {f} frames ({a} angles, {c} ch, {len(gx)}x"
              f"{len(gz)} px) in {dt:.2f}s -> {dt / f * 1e3:.1f} ms/frame "
              f"(warm, end-to-end incl. relay dispatch+fetch; the on-chip "
              f"kernel rate is benchmarked in PARITY.md 2.21)",
              file=sys.stderr)

        pos = ds.positions[0]
        pos = pos[~np.isnan(pos[:, 0])]

    fig, ax = plt.subplots(figsize=(5.2, 6.0))
    im = ax.imshow(bmodes[0], cmap="gray", vmin=-40, vmax=0, aspect="auto",
                   extent=[gx[0] * 1e3, gx[-1] * 1e3,
                           gz[-1] * 1e3, gz[0] * 1e3])
    ax.scatter(pos[:, 0] * 1e3, pos[:, 1] * 1e3, s=90, marker="o",
               facecolors="none", edgecolors="#e4683a", linewidths=1.8,
               label="GT scatterers")
    ax.set_xlabel("lateral [mm]")
    ax.set_ylabel("depth [mm]")
    ax.set_title("PALA pipeline: SVD clutter filter → DAS beamform (TPU)")
    ax.legend(loc="lower right", framealpha=0.85)
    fig.colorbar(im, ax=ax, label="B-mode [dB]", shrink=0.8)
    fig.tight_layout()
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=130)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
