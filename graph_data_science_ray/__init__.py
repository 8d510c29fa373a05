"""graph_data_science_ray — a Ray-Data-native link-graph analytics engine.

Brand-new implementation (not a port) of the query/data-processing capabilities of
Neo4j Graph Data Science's core link-graph algorithms — PageRank / ArticleRank /
Eigenvector, weakly connected components, label propagation, triangle counting +
local clustering coefficient — as bulk-synchronous iterations over canonical edge
tables, plus the training-data pipeline operators (dedup, similarity search, text
analysis) a 100 TB corpus pipeline needs.  See SURVEY.md for the blueprint and
per-operator reference citations.
"""

from .pipelines.degree import degree_centrality
from .pipelines.labelprop import label_propagation
from .functions.knn import knn_graph
from .functions.nodesim import node_similarity
from .pipelines.betweenness import betweenness_centrality
from .pipelines.centrality import closeness_centrality, harmonic_centrality
from .pipelines.coloring import (conductance, k1_coloring,
                                 modularity_optimization)
from .pipelines.fastrp import fastrp
from .pipelines.louvain import louvain, modularity_of
from .pipelines.modes import run
from .pipelines.pagerank import article_rank, eigenvector, pagerank
from .pipelines.allpaths import all_shortest_paths
from .pipelines.splitting import split_relationships
from .pipelines.paths import dag_longest_path, dijkstra, shortest_paths
from .pipelines.paths_local import astar, delta_stepping, yens
from .functions.linkpred import link_prediction
from .functions.scalers import one_hot_encoding, scale
from .pipelines.scc import scc
from .pipelines.spanning import bfs, dfs, spanning_tree
from .pipelines.alpha_extras import (approx_max_k_cut, collapse_path,
                                     influence_maximization)
from .pipelines.graphsage import (GraphSageModel, graphsage_embeddings,
                                  graphsage_train)
from .pipelines.hits import hits
from .pipelines.sllpa import sllpa
from .pipelines.node2vec import node2vec
from .pipelines.walks import random_walks
from .pipelines.pregel import Computation, PregelResult, run_pregel
from .pipelines.triangles import (local_clustering_coefficient, triangle_count,
                                  triangle_count_streaming, triangle_stream)
from .pipelines.wcc import wcc
from .state.catalog import GraphCatalog, degree_distribution, filter_subgraph
from .state.graph import Graph, ParquetGraph
from .state.store import GraphStore as TypedGraphStore
# training-data pipeline operators (the 100 TB corpus surface)
from .functions.dedup import (exact_dedup, minhash_near_dups,
                              minhash_md5_near_dups, simhash_table,
                              simhash_near_dups, embedding_dup_pairs,
                              embedding_dup_pairs_lsh, add_ngram_jaccard,
                              ngram_contamination, cluster_dedup,
                              incremental_dedup, semantic_dedup,
                              substring_dup_stats)
from .functions.similarity import (cosine_topk, lsh_topk, ivf_topk,
                                   train_ivf_centroids, ivf_partition,
                                   build_ivf_index, ivf_topk_from_index,
                                   quantize_embeddings, cosine_topk_int8)
from .functions.text import (TokenCounter, TextStats, QualityScorer,
                             LanguageId, Sha256, Fingerprint, vocab_top_terms,
                             RepetitionStats, repetition_filter, tfidf_top_terms,
                             json_extract_scalar, redact_pii, chunk_documents,
                             corpus_term_counts, unigram_lm_scores,
                             bpe_token_counts, BPE_PRETOKEN_PATTERN)
from .functions.relational import (asof_join, range_join, top_k_per_group,
                                   grouped_quantiles, window_functions,
                                   rolling_agg, rolling_range_agg,
                                   grouped_agg, distinct)
from .functions.joins import hash_join, semi_join_filter
from .functions.packing import (global_prefix_sum, global_order,
                                pack_documents)
from .sources.sink import (read_partitioned_parquet,
                           write_partitioned_parquet)
from .functions.pairwise import (add_pairwise_similarity, as_vector,
                                 pairwise_scores,
                                 similarity_cosine, similarity_euclidean,
                                 similarity_euclidean_distance,
                                 similarity_jaccard, similarity_overlap,
                                 similarity_pearson)
from .pipelines.windows import tumbling_window, sessionize, hopping_window
from .pipelines.corpus_clean import clean_corpus
from .functions.sampling import (hash_sample, hash_split,
                                 sample_sql_predicate, shard_shuffle,
                                 stratified_sample, sample_n_per_group,
                                 upsample_by_weight)
from .functions.multimodal import (ImageFeatureExtractor, FrameSampler,
                                   decode_image, encode_ppm, resize_nearest,
                                   image_feature, synthetic_media_table)
from .functions.funnel import funnel_counts, funnel_depths, retention_cohorts
from .functions.sketch import (approx_distinct, approx_distinct_by,
                               approx_distinct_windowed,
                               bloom_build,
                               bloom_semi_join, cms_build, cms_lookup,
                               hll_estimate, hll_registers)
from .functions import util as gds_util

__all__ = [
    "Graph", "GraphCatalog", "Computation", "PregelResult", "run_pregel", "run",
    "pagerank", "article_rank", "eigenvector", "degree_centrality",
    "wcc", "label_propagation", "triangle_count", "local_clustering_coefficient",
    "shortest_paths", "louvain", "modularity_of", "ParquetGraph",
    "node_similarity", "dijkstra", "dag_longest_path", "TypedGraphStore",
    "betweenness_centrality",
    "k1_coloring", "modularity_optimization", "knn_graph", "fastrp",
    "closeness_centrality", "harmonic_centrality", "scc", "astar", "yens",
    "random_walks", "node2vec", "conductance", "spanning_tree", "bfs", "dfs",
    "hits", "sllpa", "delta_stepping", "link_prediction", "one_hot_encoding", "scale",
    "all_shortest_paths", "split_relationships",
    "triangle_count_streaming", "triangle_stream",
    "degree_distribution", "filter_subgraph",
    "approx_max_k_cut", "influence_maximization", "collapse_path",
    "graphsage_train", "graphsage_embeddings", "GraphSageModel",
    # training-data pipeline operators
    "exact_dedup", "minhash_near_dups", "minhash_md5_near_dups",
    "simhash_table", "simhash_near_dups", "embedding_dup_pairs",
    "embedding_dup_pairs_lsh", "cluster_dedup", "incremental_dedup",
    "semantic_dedup", "substring_dup_stats",
    "cosine_topk", "lsh_topk", "ivf_topk",
    "train_ivf_centroids", "ivf_partition", "build_ivf_index",
    "ivf_topk_from_index", "ImageFeatureExtractor",
    "FrameSampler", "decode_image", "encode_ppm", "resize_nearest",
    "image_feature", "synthetic_media_table", "TokenCounter", "TextStats",
    "QualityScorer", "LanguageId", "Sha256", "Fingerprint",
    "tumbling_window", "sessionize", "hopping_window",
    "asof_join", "range_join", "top_k_per_group", "grouped_quantiles",
    "hash_join", "semi_join_filter", "vocab_top_terms",
    "add_pairwise_similarity", "pairwise_scores", "similarity_cosine",
    "similarity_euclidean", "similarity_euclidean_distance",
    "similarity_jaccard", "similarity_overlap", "similarity_pearson",
    "as_vector", "gds_util",
    "hash_sample", "hash_split", "sample_sql_predicate", "shard_shuffle",
    "stratified_sample", "sample_n_per_group",
    "approx_distinct", "approx_distinct_by", "approx_distinct_windowed", "bloom_build", "bloom_semi_join", "cms_build", "cms_lookup",
    "clean_corpus", "corpus_term_counts", "unigram_lm_scores", "quantize_embeddings",
    "cosine_topk_int8",
    "bpe_token_counts", "BPE_PRETOKEN_PATTERN", "funnel_counts", "funnel_depths", "retention_cohorts",
    "hll_estimate", "hll_registers",
    "RepetitionStats", "repetition_filter", "window_functions",
    "rolling_agg", "rolling_range_agg", "grouped_agg", "distinct",
    "tfidf_top_terms", "json_extract_scalar", "redact_pii",
    "global_prefix_sum", "global_order", "pack_documents", "add_ngram_jaccard",
    "ngram_contamination", "upsample_by_weight", "chunk_documents",
    "write_partitioned_parquet", "read_partitioned_parquet",
]

__version__ = "0.1.0"
