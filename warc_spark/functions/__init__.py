from . import text, dedup, similarity, multimodal  # noqa: F401
