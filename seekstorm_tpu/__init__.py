"""seekstorm_tpu — a TPU-native hybrid lexical + vector search engine.

A ground-up rebuild of the capabilities of SeekStorm (sub-millisecond
lexical & vector search library + multi-tenant server) with the data plane
on TPU: HBM-resident posting CSR tensors scored by batched decode ->
MXU-matmul BM25F -> fused top-k; quantized matmul distance scans for
vectors; shards mapped onto the device mesh with on-device merging.

Public API mirrors the reference's library surface
(create_index/open_index, document CRUD, commit, search, facets, hybrid).
"""

import os as _os

# Persistent XLA compilation cache: query-plan shapes are bucketed, so a few
# dozen compiled executables cover steady-state serving; caching them across
# processes removes cold-start compiles.  Disable with SEEKSTORM_TPU_NO_CACHE.
# Pin the backend when the caller asks for one via env.  Some TPU plugin
# stacks (axon) register themselves regardless of JAX_PLATFORMS, so the
# env var alone does not stick — it must be applied through jax.config.
# Without this, a subprocess meant to run on CPU (tests' server e2e,
# sidecar tools) silently grabs the machine's one TPU and deadlocks any
# concurrent TPU user.
_want = (_os.environ.get("JAX_PLATFORMS")
         or _os.environ.get("JAX_PLATFORM_NAME"))
if _want:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _want.lower())
    except Exception:  # pragma: no cover - best-effort pin
        pass

if not _os.environ.get("SEEKSTORM_TPU_NO_CACHE"):
    try:
        import jax as _jax

        # CPU-only sessions must NOT use the persistent cache: this XLA
        # build round-trips CPU executables through an AOT path whose
        # machine-feature check (+prefer-no-scatter/+prefer-no-gather
        # pseudo-features) fails on reload and the loaded executable
        # MIS-EXECUTES (observed: wrong gather results in the scoring
        # kernel).  Cache only the TPU platform.
        _platforms = str(getattr(_jax.config, "jax_platforms", "") or "auto")
        if "cpu" != _platforms.strip():
            _cache_dir = _os.path.join(
                _os.environ.get(
                    "SEEKSTORM_TPU_CACHE_DIR",
                    _os.path.join(_os.path.expanduser("~"), ".cache",
                                  "seekstorm_tpu_xla"),
                ),
                _platforms.replace(",", "_").replace("/", "_"),
            )
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .index import Index, create_index, open_index
from .schema import (
    AccessType,
    QueryCompletion,
    BLOCK_SIZE,
    ClusteringConfig,
    ClusteringMode,
    DocumentCompression,
    FieldType,
    FrequentwordType,
    IndexMeta,
    InferenceType,
    LexicalSimilarity,
    Precision,
    Quantization,
    SchemaField,
    SpellingCorrection,
    StemmerType,
    StopwordType,
    TokenizerType,
    VectorConfig,
    VectorSimilarity,
)
from .search import (
    FacetFilter,
    Highlight,
    QueryFacet,
    QueryType,
    Ranges,
    ResultObject,
    ResultSet,
    ResultSort,
    ResultType,
    SearchMode,
    SearchRequest,
    search,
    search_batch,
)

__version__ = "0.1.0"

__all__ = [
    "Index",
    "create_index",
    "open_index",
    "SchemaField",
    "FieldType",
    "IndexMeta",
    "TokenizerType",
    "StemmerType",
    "StopwordType",
    "FrequentwordType",
    "LexicalSimilarity",
    "AccessType",
    "DocumentCompression",
    "SpellingCorrection",
    "QueryCompletion",
    "VectorConfig",
    "VectorSimilarity",
    "Precision",
    "Quantization",
    "InferenceType",
    "ClusteringConfig",
    "ClusteringMode",
    "SearchRequest",
    "SearchMode",
    "QueryType",
    "ResultType",
    "ResultSet",
    "ResultObject",
    "QueryFacet",
    "Ranges",
    "FacetFilter",
    "ResultSort",
    "Highlight",
    "search",
    "search_batch",
    "BLOCK_SIZE",
]
