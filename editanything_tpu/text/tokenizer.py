"""CLIP byte-level BPE tokenizer, self-contained (no hub download).

The reference gets tokenization implicitly from HF `pipeline.tokenizer`
(/root/reference/editany_lora.py:110-194) or the open_clip SimpleTokenizer
(ldm/modules/encoders/modules.py:134-193 via open_clip). This is the same
algorithm implemented from the published spec, loading its vocabulary from
user-supplied assets (this deployment has zero network egress):

- OpenAI/open_clip format: `bpe_simple_vocab_16e6.txt.gz` (one merge per
  line, lines 1..48894 used)
- HF format: `vocab.json` + `merges.txt`

Vocab layout (CLIP): 256 byte symbols + 256 byte+'</w>' symbols + 48894
merged tokens + <|startoftext|> (49406) + <|endoftext|> (49407) = 49408.
Text cleanup approximates ftfy with html-unescape + whitespace collapse +
lowercase (CLIP's canonical preprocessing; ftfy mojibake repair is a no-op
on well-formed prompt strings).
"""

from __future__ import annotations

import gzip
import html
import json
import re
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte -> printable-unicode map."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


# CLIP's token split pattern. Python `re` lacks \p{L}/\p{N}; the unicode
# str.isalpha()/isdigit() classes via explicit alternation match CLIP's
# behavior for practical prompt text.
_PAT = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[^\W\d_]+|\d|[^\s\w]+",
    re.IGNORECASE | re.UNICODE)


class CLIPTokenizer:
    """Encode prompt strings to CLIP token ids.

    Args:
      merges: list of merge pairs ["a b", ...] in rank order, OR
      vocab_path: path to bpe_simple_vocab_16e6.txt(.gz) or merges.txt, with
        optional hf_vocab_path (vocab.json) for id remapping validation.
    """

    def __init__(self, merges: Optional[Sequence[str]] = None,
                 vocab_path: Optional[str] = None,
                 context_length: int = 77):
        if merges is None:
            if vocab_path is None:
                raise ValueError(
                    "CLIPTokenizer needs `merges` or `vocab_path` "
                    "(bpe_simple_vocab_16e6.txt.gz or merges.txt); this "
                    "environment cannot download them")
            merges = _load_merges(vocab_path)
        self.byte_encoder = bytes_to_unicode()
        merge_pairs = [tuple(m.split()) for m in merges]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for pair in merge_pairs:
            vocab.append("".join(pair))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {p: i for i, p in enumerate(merge_pairs)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.bos_id = self.encoder["<|startoftext|>"]
        self.eos_id = self.encoder["<|endoftext|>"]
        self.context_length = context_length
        # textual-inversion placeholders: literal string -> token id rows
        # appended to the embedding table (the reference's
        # tokenizer.add_tokens + resize_token_embeddings,
        # utils/texutal_inversion.py:623-660). A multi-vector placeholder
        # maps one string to all its vector ids.
        self.placeholders: dict = {}

    def add_placeholder(self, token: str, ids: Sequence[int]) -> None:
        """Register a placeholder string that encodes to `ids` verbatim."""
        self.placeholders[token] = [int(i) for i in ids]

    @classmethod
    def from_hf(cls, vocab_json: str, merges_txt: str,
                context_length: int = 77) -> "CLIPTokenizer":
        """Build from HF-format vocab.json + merges.txt; asserts the id
        layout matches CLIP's canonical ordering."""
        tok = cls(merges=_load_merges(merges_txt),
                  context_length=context_length)
        with open(vocab_json) as f:
            hf_vocab = json.load(f)
        # HF and canonical layouts agree for CLIP; validate a few anchors.
        for anchor in ("<|startoftext|>", "<|endoftext|>"):
            if anchor in hf_vocab:
                assert hf_vocab[anchor] == tok.encoder[anchor], anchor
        return tok

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        """Text -> token ids (no BOS/EOS, no padding)."""
        if self.placeholders and any(ph in text for ph in self.placeholders):
            # splice placeholder ids verbatim around BPE-encoded segments
            pattern = "|".join(
                re.escape(ph) for ph in
                sorted(self.placeholders, key=len, reverse=True))
            ids: List[int] = []
            for piece in re.split(f"({pattern})", text):
                if piece in self.placeholders:
                    ids.extend(self.placeholders[piece])
                elif piece.strip():
                    ids.extend(self._encode_bpe(piece))
            return ids
        return self._encode_bpe(text)

    def _encode_bpe(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in _PAT.findall(text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytearray(byte_decoder[c] for c in text if c in byte_decoder)
        return (raw.decode("utf-8", errors="replace")
                .replace("</w>", " ").strip())

    def __call__(self, texts, *, pad_to: Optional[int] = None,
                 truncate: bool = False):
        """Tokenize to a fixed-shape int32 array with BOS/EOS + EOS padding.

        Returns (B, L) numpy int32. Without `pad_to`, L = context_length
        when truncate else the max over the batch, rounded UP to a multiple
        of (context_length) windows minus the shared BOS/EOS bookkeeping —
        callers wanting long-prompt windows use engine/prompts.py.
        """
        import numpy as np
        if isinstance(texts, str):
            texts = [texts]
        all_ids = [self.encode(t) for t in texts]
        if truncate:
            limit = (pad_to or self.context_length) - 2
            all_ids = [ids[:limit] for ids in all_ids]
        length = pad_to or (max(len(i) for i in all_ids) + 2)
        out = np.full((len(all_ids), length), self.eos_id, np.int32)
        for r, ids in enumerate(all_ids):
            row = [self.bos_id] + list(ids[:length - 2]) + [self.eos_id]
            out[r, :len(row)] = row
        return out


def _load_merges(path: str) -> List[str]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:
        lines = f.read().split("\n")
    if lines and lines[0].startswith("#version"):
        # HF merges.txt header
        lines = lines[1:]
        return [l for l in lines if l.strip()]
    # OpenAI bpe_simple_vocab_16e6 format: skip header line, take the CLIP
    # slice (merges 1..49152-256-2+1 per open_clip SimpleTokenizer)
    lines = lines[1:49152 - 256 - 2 + 1]
    return [l for l in lines if l.strip()]


class GPT2Tokenizer:
    """Byte-level BPE as used by GPT-2/OPT (BLIP2's language side).

    Differences from CLIP BPE: no '</w>' end-of-word marker (spaces are
    encoded into tokens via the 'Ġ' byte symbol), no lowercasing, and the
    GPT-2 split pattern. Loads HF-format vocab.json + merges.txt
    (user-supplied; zero-egress environment).
    """

    _PAT = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+",
        re.UNICODE)

    def __init__(self, vocab: Dict[str, int], merges: Sequence[str],
                 bos_token: str = "</s>", eos_token: str = "</s>",
                 pad_token: str = "<pad>"):
        self.byte_encoder = bytes_to_unicode()
        self.encoder = dict(vocab)
        self.decoder = {i: t for t, i in self.encoder.items()}
        pairs = [tuple(m.split()) for m in merges if m.strip()]
        self.bpe_ranks = {p: i for i, p in enumerate(pairs)}
        self.cache: Dict[str, str] = {}
        self.bos_id = self.encoder.get(bos_token, 2)
        self.eos_id = self.encoder.get(eos_token, 2)
        self.pad_id = self.encoder.get(pad_token, 1)

    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str, **kw):
        with open(vocab_json) as f:
            vocab = json.load(f)
        with open(merges_txt) as f:
            lines = f.read().split("\n")
        if lines and lines[0].startswith("#version"):
            lines = lines[1:]
        return cls(vocab, lines, **kw)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token)
        pairs = _get_pairs(word) if len(word) > 1 else set()
        while pairs:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in self._PAT.findall(text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        text = "".join(self.decoder.get(int(i), "") for i in ids
                       if int(i) not in (self.bos_id, self.pad_id))
        raw = bytearray(byte_decoder[c] for c in text if c in byte_decoder)
        return raw.decode("utf-8", errors="replace")


class BertTokenizer:
    """WordPiece tokenizer (bert-base-uncased semantics) for GroundingDINO's
    text side; vocab user-supplied (vocab.txt, one token per line)."""

    def __init__(self, vocab: Dict[str, int]):
        self.vocab = dict(vocab)
        self.ids_to_tokens = {i: t for t, i in self.vocab.items()}
        self.cls_id = self.vocab.get("[CLS]", 101)
        self.sep_id = self.vocab.get("[SEP]", 102)
        self.pad_id = self.vocab.get("[PAD]", 0)
        self.unk_id = self.vocab.get("[UNK]", 100)

    @classmethod
    def from_file(cls, vocab_txt: str) -> "BertTokenizer":
        with open(vocab_txt, encoding="utf-8") as f:
            toks = [l.rstrip("\n") for l in f]
        return cls({t: i for i, t in enumerate(toks)})

    def _basic(self, text: str) -> List[str]:
        text = text.lower()
        out: List[str] = []
        word = ""
        for ch in text:
            if ch.isalnum():
                word += ch
            else:
                if word:
                    out.append(word)
                    word = ""
                if not ch.isspace():
                    out.append(ch)
        if word:
            out.append(word)
        return out

    def _wordpiece(self, word: str) -> List[str]:
        if word in self.vocab:
            return [word]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return ["[UNK]"]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for w in self._basic(text):
            out.extend(self._wordpiece(w))
        return out

    def encode_padded(self, text: str, max_len: int):
        """-> (ids (L,), mask (L,) bool, tokens list) with [CLS]/[SEP]."""
        import numpy as np
        tokens = ["[CLS]"] + self.tokenize(text)[:max_len - 2] + ["[SEP]"]
        ids = np.full((max_len,), self.pad_id, np.int32)
        for i, t in enumerate(tokens):
            ids[i] = self.vocab.get(t, self.unk_id)
        mask = np.zeros((max_len,), bool)
        mask[:len(tokens)] = True
        return ids, mask, tokens


def tiny_bert_tokenizer(words: Sequence[str] = ("a", "dog", "head", "cat",
                                                "sofa")) -> BertTokenizer:
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, ".": 4}
    i = 5
    for w in words:
        vocab[w] = i
        i += 1
    for ch in "abcdefghijklmnopqrstuvwxyz":
        for p in (ch, "##" + ch):
            if p not in vocab:
                vocab[p] = i
                i += 1
    return BertTokenizer(vocab)


def tiny_gpt2_tokenizer(words: Sequence[str] = ("a", "cat", "dog", "photo")
                        ) -> GPT2Tokenizer:
    """Small GPT-2-style tokenizer for tests: byte vocab + per-word merges
    (with the leading-space 'Ġ' variants)."""
    base = list(bytes_to_unicode().values())
    merges: List[str] = []
    toks: List[str] = []
    for w in words:
        for prefix in ("", "Ġ"):       # plain and space-prefixed
            chars = list(prefix + w)
            while len(chars) > 1:
                merges.append(f"{chars[0]} {chars[1]}")
                chars = [chars[0] + chars[1]] + chars[2:]
                toks.append(chars[0])  # include intermediate merge results
    seen: set = set()
    merges = [m for m in merges if not (m in seen or seen.add(m))]
    vocab = {"<pad>": 1, "</s>": 2}
    idx = 3
    for t in base + toks:
        if t not in vocab:
            vocab[t] = idx
            idx += 1
    return GPT2Tokenizer(vocab, merges)


def tiny_tokenizer(words: Sequence[str] = ("photo", "of", "a", "cat", "dog"),
                   context_length: int = 77) -> CLIPTokenizer:
    """Deterministic small tokenizer for tests: merges that build the given
    words character-by-character (left-to-right)."""
    merges = []
    for w in words:
        chars = list(w[:-1]) + [w[-1] + "</w>"]
        while len(chars) > 1:
            merges.append(f"{chars[0]} {chars[1]}")
            chars = [chars[0] + chars[1]] + chars[2:]
    # de-dup preserving order
    seen = set()
    uniq = [m for m in merges if not (m in seen or seen.add(m))]
    return CLIPTokenizer(merges=uniq, context_length=context_length)
