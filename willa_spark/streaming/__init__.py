from .compiler import StreamingTopologyRunner, run_streaming_topology

__all__ = ["StreamingTopologyRunner", "run_streaming_topology"]
