from .engine import FALLBACK_IDS, InferenceEngine

__all__ = ["FALLBACK_IDS", "InferenceEngine"]
