"""Production serving runtime: dynamic batch coalescing over the AOT
pipeline, in-process and over TCP.

No reference equivalent — the torch reference evaluates fixed datasets
from a live python process (/root/reference/main.py:291-347). This layer
is the missing production story on top of ``stofnet_tpu/serve.py``'s
StableHLO export: concurrent clients submit individual waveforms, the
host coalesces them into large static-shape batches (where the TPU's MXU
actually earns its throughput), and results fan back out per request.
"""

from stofnet_tpu.serving.host import Overloaded, ServingHost, batch_buckets
from stofnet_tpu.serving.router import LengthRouter
from stofnet_tpu.serving.tcp import (WIRE_CODES, ServingClient,
                                     ServingTCPServer, decode_payload,
                                     encode_rows, start_server)

__all__ = [
    "ServingHost",
    "Overloaded",
    "LengthRouter",
    "batch_buckets",
    "ServingClient",
    "ServingTCPServer",
    "start_server",
    "WIRE_CODES",
    "encode_rows",
    "decode_payload",
]
