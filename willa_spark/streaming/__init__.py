from .compiler import StreamingTopologyRunner, run_streaming_topology
from .ann import (
    LshAnnConfig,
    embedding_dedup_step,
    ivf_gen_index_step,
    ivf_gen_probe_step,
    ivf_index_step,
    ivf_probe_step,
    ivf_retrain,
    ivf_store_init,
    ivf_store_meta,
    lsh_index_step,
    lsh_probe_step,
)
from .corpus_pipeline import (
    corpus_curation_batch,
    corpus_curation_step,
    pack_sequences_step,
)
from .near_dedup import (
    minhash_dedup_step,
    minhash_store_prune,
    simhash_dedup_step,
    winnow_dedup_step,
)
from .store import (
    store_append,
    store_compact,
    store_compact_every,
    store_partitions,
    store_prune,
    store_read,
)

__all__ = [
    "store_append",
    "store_compact",
    "store_compact_every",
    "store_partitions",
    "store_prune",
    "store_read",
    "corpus_curation_batch",
    "corpus_curation_step",
    "pack_sequences_step",
    "StreamingTopologyRunner",
    "run_streaming_topology",
    "LshAnnConfig",
    "embedding_dedup_step",
    "ivf_gen_index_step",
    "ivf_gen_probe_step",
    "ivf_index_step",
    "ivf_probe_step",
    "ivf_retrain",
    "ivf_store_init",
    "ivf_store_meta",
    "lsh_index_step",
    "lsh_probe_step",
    "minhash_dedup_step",
    "minhash_store_prune",
    "simhash_dedup_step",
    "winnow_dedup_step",
]
