"""Whisper vocabulary and greedy longest-match tokenizer.

Semantics match the reference `whisper_vocab` (src/whisper.cpp:429-458) and
`tokenize` (src/whisper.cpp:3282-3330): tokens are stored as raw byte strings
(the model file contains byte-decoded BPE entries), words are split with the
GPT-2 pre-tokenizer regex evaluated with ASCII character classes (C locale),
and each word is encoded by greedy longest-prefix match against the vocab.

Special-token ids follow OpenAI's tokenizer: the base (English) layout is
shifted for multilingual models by the number of extra language tokens
(src/whisper.cpp:1625-1639).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from .languages import LANGUAGES, lang_str

# GPT-2 pre-tokenizer pattern, byte-level with ASCII classes (C locale parity
# with the reference's std::regex run under the default locale).
_WORD_PAT = re.compile(
    rb"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


@dataclass
class WhisperVocab:
    n_vocab: int = 51864
    token_to_id: Dict[bytes, int] = field(default_factory=dict)
    id_to_token: Dict[int, bytes] = field(default_factory=dict)

    # default (English) special-token ids; shifted in __post_init__-like
    # fixup for multilingual models (src/whisper.cpp:439-449, 1625-1639)
    token_eot: int = 50256
    token_sot: int = 50257
    token_translate: int = 50357
    token_transcribe: int = 50358
    token_solm: int = 50359
    token_prev: int = 50360
    token_nosp: int = 50361
    token_not: int = 50362
    token_beg: int = 50363

    @property
    def is_multilingual(self) -> bool:
        return self.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return self.n_vocab - 51765 - (1 if self.is_multilingual else 0)

    def apply_multilingual_shift(self) -> None:
        """Shift special ids for multilingual vocabs (src/whisper.cpp:1625-1639)."""
        if not self.is_multilingual:
            return
        self.token_eot += 1
        self.token_sot += 1
        dt = self.num_languages - 98
        self.token_translate += dt
        self.token_transcribe += dt
        self.token_solm += dt
        self.token_prev += dt
        self.token_nosp += dt
        self.token_not += dt
        self.token_beg += dt

    def synthesize_missing(self, n_read: int) -> None:
        """Fill ids >= n_read with placeholder names (src/whisper.cpp:1641-1672)."""
        for i in range(n_read, self.n_vocab):
            if i > self.token_beg:
                word = f"[_TT_{i - self.token_beg}]"
            elif i == self.token_eot:
                word = "[_EOT_]"
            elif i == self.token_sot:
                word = "[_SOT_]"
            elif i == self.token_translate:
                word = "[_TRANSLATE_]"
            elif i == self.token_transcribe:
                word = "[_TRANSCRIBE_]"
            elif i == self.token_solm:
                word = "[_SOLM_]"
            elif i == self.token_prev:
                word = "[_PREV_]"
            elif i == self.token_nosp:
                word = "[_NOSP_]"
            elif i == self.token_not:
                word = "[_NOT_]"
            elif i == self.token_beg:
                word = "[_BEG_]"
            elif self.token_sot < i <= self.token_sot + self.num_languages:
                code = lang_str(i - self.token_sot - 1)
                word = f"[_LANG_{code}]"
            else:
                word = f"[_extra_token_{i}]"
            wb = word.encode("utf-8")
            self.token_to_id[wb] = i
            self.id_to_token[i] = wb

    # -- lookups -----------------------------------------------------------

    def token_bytes(self, tid: int) -> bytes:
        return self.id_to_token.get(tid, b"")

    def token_str(self, tid: int) -> str:
        return self.token_bytes(tid).decode("utf-8", errors="replace")

    def lang_token(self, lid: int) -> int:
        return self.token_sot + 1 + lid

    def tokenize(self, text: str | bytes) -> List[int]:
        """Greedy longest-match encode (src/whisper.cpp:3282-3330)."""
        data = text.encode("utf-8") if isinstance(text, str) else text
        tokens: List[int] = []
        for m in _WORD_PAT.finditer(data):
            word = m.group(0)
            if not word:
                continue
            i, n = 0, len(word)
            while i < n:
                j = n
                found = False
                while j > i:
                    tid = self.token_to_id.get(word[i:j])
                    if tid is not None:
                        tokens.append(tid)
                        i = j
                        found = True
                        break
                    j -= 1
                if not found:
                    i += 1  # unknown byte: skip (reference logs and skips)
        return tokens

    def detokenize(self, ids) -> str:
        return b"".join(self.token_bytes(int(t)) for t in ids).decode(
            "utf-8", errors="replace"
        )

    def is_timestamp(self, tid: int) -> bool:
        return tid >= self.token_beg
