"""Native (C) components: host-side CSPRNG."""

from .chacha import ChaCha20Stream, chacha20_words, have_native

__all__ = ["ChaCha20Stream", "chacha20_words", "have_native"]
