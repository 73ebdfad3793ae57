"""GGUF container + GGML block-quantization support (host side).

Spec-conformant replacements for the llama.cpp gguf/ggml loading surface the
reference consumes (SURVEY.md §2.2, §2.4): reader, writer, and numpy reference
(de)quantizers for Q4_0/Q4_1/Q5_0/Q5_1/Q8_0/Q4_K/Q5_K/Q6_K/F16/BF16/F32.
"""

from .constants import GGMLType, GGUFValueType, QK_K, ggml_type_size, tensor_nbytes
from .reader import GGUFReader, TensorInfo
from .writer import GGUFWriter
from . import quants

__all__ = [
    "GGMLType",
    "GGUFValueType",
    "QK_K",
    "GGUFReader",
    "GGUFWriter",
    "TensorInfo",
    "ggml_type_size",
    "tensor_nbytes",
    "quants",
]
