from .compiler import StreamingTopologyRunner, run_streaming_topology
from .ann import LshAnnConfig, lsh_index_step, lsh_probe_step
from .near_dedup import minhash_dedup_step, simhash_dedup_step

__all__ = [
    "StreamingTopologyRunner",
    "run_streaming_topology",
    "LshAnnConfig",
    "lsh_index_step",
    "lsh_probe_step",
    "minhash_dedup_step",
    "simhash_dedup_step",
]
