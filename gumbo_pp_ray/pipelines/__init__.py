"""End-to-end Ray Data pipelines + deterministic synthetic corpus."""

from .corpus import gen_corpus, write_corpus, CorpusSpec
from .extract_pipeline import extract_dataset, run_extraction

__all__ = ["gen_corpus", "write_corpus", "CorpusSpec",
           "extract_dataset", "run_extraction"]
