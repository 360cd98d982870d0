"""Content hashing used for song identity and model registry lookup.

Matches the reference's two hashing contracts:
  * blake2b-11 song id for local files (reference src/main.py:150-156)
  * md5 of the last 10000*1024 bytes of an MDX model file, used as the key
    into the model hyperparameter registry (reference src/mdx.py:81-90)
"""

from __future__ import annotations

import hashlib


def file_hash_blake2b(filepath: str, digest_chars: int = 11) -> str:
    h = hashlib.blake2b()
    with open(filepath, "rb") as f:
        while chunk := f.read(8192):
            h.update(chunk)
    return h.hexdigest()[:digest_chars]


def file_hash_md5_tail(filepath: str, tail_bytes: int = 10000 * 1024) -> str:
    with open(filepath, "rb") as f:
        try:
            f.seek(-tail_bytes, 2)
        except OSError:
            f.seek(0)
        return hashlib.md5(f.read()).hexdigest()
