from .table import CodingTable, split_to_chars
from .processor import TextProcessor
from .cleaners import punct_corrector, basic_cleaners, english_cleaners

__all__ = [
    "CodingTable",
    "split_to_chars",
    "TextProcessor",
    "punct_corrector",
    "basic_cleaners",
    "english_cleaners",
]
