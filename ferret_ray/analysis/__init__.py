from .analyzer import (
    Analyzer,
    Token,
    hyphen_filter,
    keyword_analyzer,
    letter_analyzer,
    lowercase_filter,
    standard_analyzer,
    stop_filter,
    tokenize,
    whitespace_analyzer,
)
from .stopwords import ENGLISH_STOP_WORDS, FULL_ENGLISH_STOP_WORDS
from .tokenizer import (
    LetterTokenizer,
    NonTokenizer,
    StandardTokenizer,
    WhitespaceTokenizer,
)

__all__ = [
    "Analyzer",
    "ENGLISH_STOP_WORDS",
    "FULL_ENGLISH_STOP_WORDS",
    "LetterTokenizer",
    "NonTokenizer",
    "StandardTokenizer",
    "Token",
    "WhitespaceTokenizer",
    "hyphen_filter",
    "keyword_analyzer",
    "letter_analyzer",
    "lowercase_filter",
    "standard_analyzer",
    "stop_filter",
    "tokenize",
    "whitespace_analyzer",
]
