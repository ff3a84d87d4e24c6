"""CLI: config + train/evaluate driver + benchmark sweeps."""
