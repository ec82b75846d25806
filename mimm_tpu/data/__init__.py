from .tokenizer import NativeWordPieceTokenizer, WordPieceTokenizer
from .features import (
    InputExample,
    InputFeatures,
    TokenFeatureSet,
    convert_examples_to_features,
    create_examples_from_tsv,
    load_and_cache_examples,
)
from .pipeline import (
    CXRImageDataset,
    CXRImageDiseaseDataset,
    CXRImageReportDataset,
    Loader,
    device_prefetch,
)
from . import etl, transforms

__all__ = [
    "NativeWordPieceTokenizer",
    "WordPieceTokenizer",
    "InputExample",
    "InputFeatures",
    "TokenFeatureSet",
    "convert_examples_to_features",
    "create_examples_from_tsv",
    "load_and_cache_examples",
    "CXRImageDataset",
    "CXRImageDiseaseDataset",
    "CXRImageReportDataset",
    "Loader",
    "device_prefetch",
    "etl",
    "transforms",
]
