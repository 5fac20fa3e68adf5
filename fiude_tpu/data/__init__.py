from fiude_tpu.data.loader import ArrayLoader, convert_to_arrays
from fiude_tpu.data.builder import DataConstructor
from fiude_tpu.data.loader import return_folds
from fiude_tpu.data.native import build_windows_fast
from fiude_tpu.data.synthetic import synthetic_dataset, write_reference_data_tree
from fiude_tpu.data.legacy import legacy_national_data, load_legacy_queries
from fiude_tpu.data.synthetic import write_legacy_national_tree
from fiude_tpu.data.embedding import (
    WordEmbeddings, build_similarity_scores, select_queries, similarity_score,
)
