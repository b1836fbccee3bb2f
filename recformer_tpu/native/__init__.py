"""Native (C++) host runtime: ragged batch packing via ctypes.

Compiled lazily with g++ into a per-user cache directory; every entry point
has a pure-numpy fallback so the framework works without a toolchain. The
public API is :class:`RaggedSequences` (pack once, batch fast) and
:func:`pack_item_table_native`.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False

_SRCS = [os.path.join(os.path.dirname(__file__), "batcher.cpp"),
         os.path.join(os.path.dirname(__file__), "tokenizer.cpp")]


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        h = hashlib.sha256()
        for src in _SRCS:
            with open(src, "rb") as f:
                h.update(f.read())
        digest = h.hexdigest()[:16]
        cache_dir = os.path.join(tempfile.gettempdir(), "recformer_tpu_native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"batcher_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", *_SRCS,
                 "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.pack_batch.argtypes = [i32p, i64p, ctypes.c_int64, i64p,
                                   ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                                   i32p, i32p, u8p]
        lib.shuffle_order.argtypes = [i64p, ctypes.c_int64, ctypes.c_uint64]
        lib.pack_item_table.argtypes = [i32p, i32p, i32p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_int32,
                                        i32p, i32p, i32p, i32p]
        lib.tokenize_corpus_hash.argtypes = [
            u8p, i64p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, ctypes.c_int64, i64p]
        lib.tokenize_corpus_hash.restype = ctypes.c_int64
        _LIB = lib
    except Exception as e:  # no toolchain / build failure -> numpy fallback
        print(f"[native] batcher unavailable ({type(e).__name__}: {e}); "
              f"using numpy fallback", file=sys.stderr)
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class RaggedSequences:
    """Contiguous ragged store of int sequences with fast batch packing."""

    def __init__(self, sequences: Sequence[Sequence[int]]):
        lens = np.fromiter((len(s) for s in sequences), np.int64, len(sequences))
        self.offsets = np.zeros(len(sequences) + 1, np.int64)
        np.cumsum(lens, out=self.offsets[1:])
        self.flat = np.empty(int(self.offsets[-1]), np.int32)
        for i, s in enumerate(sequences):
            self.flat[self.offsets[i]: self.offsets[i + 1]] = s
        self.n = len(sequences)

    def epoch_order(self, shuffle: bool, seed: int) -> np.ndarray:
        order = np.arange(self.n, dtype=np.int64)
        if not shuffle:
            return order
        lib = _build_lib()
        if lib is not None:
            lib.shuffle_order(_ptr(order, ctypes.c_int64), self.n,
                              ctypes.c_uint64(seed))
        else:
            np.random.default_rng(seed).shuffle(order)
        return order

    def pack(self, order: np.ndarray, start: int, batch: int, max_len: int
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (ids (B, max_len), lens (B,), valid (B,))."""
        out_ids = np.zeros((batch, max_len), np.int32)
        out_lens = np.zeros(batch, np.int32)
        out_valid = np.zeros(batch, np.uint8)
        lib = _build_lib()
        n_rows = len(order)  # may be a per-process shard of the full order
        if lib is not None:
            lib.pack_batch(
                _ptr(self.flat, ctypes.c_int32), _ptr(self.offsets, ctypes.c_int64),
                n_rows, _ptr(order, ctypes.c_int64), start, batch, max_len,
                _ptr(out_ids, ctypes.c_int32), _ptr(out_lens, ctypes.c_int32),
                _ptr(out_valid, ctypes.c_uint8),
            )
        else:
            for b in range(batch):
                pos = start + b
                if pos >= n_rows:
                    out_lens[b] = 1
                    continue
                row = order[pos]
                seq = self.flat[self.offsets[row]: self.offsets[row + 1]][-max_len:]
                out_ids[b, : len(seq)] = seq
                out_lens[b] = max(len(seq), 1)
                out_valid[b] = 1 if len(seq) else 0
        return out_ids, out_lens, out_valid.astype(bool)

    def batches(self, batch_size: int, max_len: int, shuffle: bool = False,
                seed: int = 0, drop_last: bool = False
                ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        order = self.epoch_order(shuffle, seed)
        n_batches = self.n // batch_size if drop_last else -(-self.n // batch_size)
        for b in range(n_batches):
            yield self.pack(order, b * batch_size, batch_size, max_len)


def pack_item_table_native(flat_ids, flat_types, flat_begin, offsets,
                           max_item_len: int, pad_id: int):
    """C++ fast path for ItemTable packing; returns the 4 dense arrays or
    None if the native library is unavailable."""
    lib = _build_lib()
    if lib is None:
        return None
    n_items = len(offsets) - 1
    out_ids = np.empty((n_items + 1, max_item_len), np.int32)
    out_types = np.empty((n_items + 1, max_item_len), np.int32)
    out_begin = np.empty((n_items + 1, max_item_len), np.int32)
    out_lens = np.empty(n_items + 1, np.int32)
    lib.pack_item_table(
        _ptr(flat_ids, ctypes.c_int32), _ptr(flat_types, ctypes.c_int32),
        _ptr(flat_begin, ctypes.c_int32), _ptr(offsets, ctypes.c_int64),
        n_items, max_item_len, pad_id,
        _ptr(out_ids, ctypes.c_int32), _ptr(out_types, ctypes.c_int32),
        _ptr(out_begin, ctypes.c_int32), _ptr(out_lens, ctypes.c_int32),
    )
    return out_ids, out_types, out_begin, out_lens


def tokenize_corpus_hash_native(items_attrs, vocab, max_attr_num: int,
                                max_attr_length: int):
    """C++ fast path for SimpleVocab corpus tokenization
    (``native/tokenizer.cpp``): ``items_attrs`` is a list (dense item-id
    order) of ``[(name, value), ...]`` attribute pairs. Returns the ragged
    corpus ``(flat_ids, flat_types, flat_begin, offsets)`` or None when the
    native library is unavailable or the text is not pure ASCII (the C++
    chunker is byte-based; Python's is code-point-based)."""
    lib = _build_lib()
    if lib is None:
        return None
    strings = []
    attr_counts = np.empty(len(items_attrs), np.int32)
    for i, attrs in enumerate(items_attrs):
        attr_counts[i] = len(attrs)
        for name, value in attrs:
            strings.append(str(name))
            strings.append(str(value))
    joined = "".join(strings)
    if not joined.isascii():
        return None
    buf = joined.encode("ascii")
    offs = np.zeros(len(strings) + 1, np.int64)
    np.cumsum(np.fromiter((len(s) for s in strings), np.int64, len(strings)),
              out=offs[1:])
    cap = int(len(items_attrs)) * max_attr_num * max_attr_length
    out_ids = np.empty(cap, np.int32)
    out_types = np.empty(cap, np.int32)
    out_begin = np.empty(cap, np.int32)
    out_offsets = np.empty(len(items_attrs) + 1, np.int64)
    buf_arr = np.frombuffer(buf, np.uint8)
    total = lib.tokenize_corpus_hash(
        _ptr(buf_arr, ctypes.c_uint8), _ptr(offs, ctypes.c_int64),
        _ptr(attr_counts, ctypes.c_int32), len(items_attrs),
        max_attr_num, max_attr_length,
        vocab.vocab_size, vocab._reserved, vocab.chunk,
        _ptr(out_ids, ctypes.c_int32), _ptr(out_types, ctypes.c_int32),
        _ptr(out_begin, ctypes.c_int32), cap, _ptr(out_offsets, ctypes.c_int64))
    if total < 0:  # pragma: no cover - cap is an exact upper bound
        return None
    return (out_ids[:total], out_types[:total], out_begin[:total], out_offsets)
