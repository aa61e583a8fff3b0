from .text import read_gutenberg_corpus, write_anagram_sink  # noqa: F401
