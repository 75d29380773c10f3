"""Host-side text tokenization: GPT-2 byte-level BPE + fairseq Dictionary.

Reproduces exactly the reference pipeline (ref: hub_interface.py:134-148):
``' ' + text.lower()`` -> GPT-2 BPE ids -> stringified ids looked up in the
fairseq ``dict.txt`` index space (4 special symbols prepended: <s>=0,
<pad>=1, </s>=2, <unk>=3, then dict.txt rows in order), truncated to 70,
``</s>`` appended.  Any index drift here corrupts every text embedding.

The BPE implementation is the canonical OpenAI GPT-2 byte-level BPE
algorithm (github.com/openai/gpt-2 ``src/encoder.py``, MIT license; the
reference vendors the same algorithm via fairseq) over the stock GPT-2
assets (``encoder.json`` + ``vocab.bpe``) — it must match that
implementation bit-for-bit or every text embedding drifts.  Asset files
are not vendored; point ``bpe_dir`` at a directory holding
``encoder.json``, ``vocab.bpe`` and ``dict.txt`` (the reference ships
them in one_peace/utils/BPE/).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, List, Optional

import numpy as np


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte <-> unicode printable-char mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class GPT2BPE:
    """Byte-level BPE encoder over the stock GPT-2 merges."""

    def __init__(self, encoder_json: str, vocab_bpe: str):
        import regex

        with open(encoder_json) as fh:
            self.encoder: Dict[str, int] = json.load(fh)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(vocab_bpe, encoding="utf-8") as fh:
            merges = fh.read().split("\n")[1:-1]
        self.bpe_ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.cache: Dict[str, str] = {}
        self.pat = regex.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
        )

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token)
        pairs = get_pairs(word)
        if not pairs:
            return token
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        import regex

        for token in regex.findall(self.pat, text):
            token_bytes = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token_bytes).split(" "))
        return ids

    def decode(self, ids: List[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        return bytearray(self.byte_decoder[c] for c in text).decode("utf-8", errors="replace")


class Dictionary:
    """fairseq-compatible symbol dictionary (ref: fairseq/data/dictionary.py
    semantics — specials <s>/<pad>/</s>/<unk> at 0..3, then dict.txt rows)."""

    def __init__(self, dict_path: Optional[str] = None):
        self.symbols: List[str] = ["<s>", "<pad>", "</s>", "<unk>"]
        self.indices: Dict[str, int] = {s: i for i, s in enumerate(self.symbols)}
        self.bos_index, self.pad_index, self.eos_index, self.unk_index = 0, 1, 2, 3
        if dict_path:
            with open(dict_path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    sym = line.rsplit(" ", 1)[0]
                    self.add_symbol(sym)

    def add_symbol(self, sym: str) -> int:
        if sym not in self.indices:
            self.indices[sym] = len(self.symbols)
            self.symbols.append(sym)
        return self.indices[sym]

    def __len__(self):
        return len(self.symbols)

    def index(self, sym: str) -> int:
        return self.indices.get(sym, self.unk_index)

    def pad(self):
        return self.pad_index

    def eos(self):
        return self.eos_index

    def bos(self):
        return self.bos_index

    def unk(self):
        return self.unk_index

    def encode_line(self, line: str) -> List[int]:
        """Whitespace-split symbols -> indices (no EOS appended)."""
        return [self.index(s) for s in line.split()]


class TextTokenizer:
    """BPE + Dictionary + the reference's preprocessing policy."""

    def __init__(self, bpe_dir: str, max_src_length: int = 70):
        self.bpe = GPT2BPE(
            os.path.join(bpe_dir, "encoder.json"), os.path.join(bpe_dir, "vocab.bpe")
        )
        self.dictionary = Dictionary(os.path.join(bpe_dir, "dict.txt"))
        self.max_src_length = max_src_length

    @property
    def pad(self):
        return self.dictionary.pad_index

    @property
    def eos(self):
        return self.dictionary.eos_index

    def encode(self, text: str) -> List[int]:
        """ref hub_interface.py:134-145: lowercase with leading space,
        BPE, dict lookup of stringified ids, truncate, append EOS."""
        bpe_ids = self.bpe.encode(" " + text.lower())
        ids = self.dictionary.encode_line(" ".join(map(str, bpe_ids)))
        ids = ids[: self.max_src_length]
        return ids + [self.eos]

    def encode_batch(self, texts: List[str]) -> np.ndarray:
        """Right-padded (B, max_len) int32 batch (ref collate_tokens,
        one_peace/utils/data_utils.py:22-47)."""
        encoded = [self.encode(t) for t in texts]
        max_len = max(len(e) for e in encoded)
        out = np.full((len(encoded), max_len), self.pad, np.int32)
        for i, e in enumerate(encoded):
            out[i, : len(e)] = e
        return out


def find_bpe_dir(explicit: Optional[str] = None) -> Optional[str]:
    """Locate the BPE assets: explicit arg > $ONE_PEACE_BPE_DIR > known spots."""
    candidates = [explicit, os.environ.get("ONE_PEACE_BPE_DIR")]
    candidates += [
        os.path.join(os.path.dirname(__file__), "..", "assets", "BPE"),
        "/root/reference/one_peace/utils/BPE",
    ]
    for c in candidates:
        if c and os.path.isfile(os.path.join(c, "encoder.json")):
            return os.path.abspath(c)
    return None
