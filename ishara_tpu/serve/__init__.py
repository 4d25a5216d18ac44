from .engine import FALLBACK_IDS, BatchedEngine, InferenceEngine
from .export import (
    export_model,
    export_serving_program,
    load_bundle,
    load_engine,
    load_serving_program,
)
from .streaming import StreamingEncoder, StreamState
from .translation_engine import BatchedTranslationEngine, TranslationEngine
from .import_weights import (
    diff_variables,
    import_by_structure,
    load_h5_weights,
    load_tflite_weights,
)

__all__ = [
    "FALLBACK_IDS",
    "BatchedEngine",
    "InferenceEngine",
    "StreamingEncoder",
    "StreamState",
    "BatchedTranslationEngine",
    "TranslationEngine",
    "export_model",
    "export_serving_program",
    "load_bundle",
    "load_engine",
    "load_serving_program",
    "diff_variables",
    "import_by_structure",
    "load_h5_weights",
    "load_tflite_weights",
]
