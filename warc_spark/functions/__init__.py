from . import text, dedup, similarity, multimodal, curation, graph, pii  # noqa: F401
