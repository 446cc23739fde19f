#!/usr/bin/env python3
"""Regenerate whisper_tpu/evals/data/english_spellings.json.

The reference evaluates WER after OpenAI's EnglishTextNormalizer, whose
spelling-standardization step maps British to American spellings via a
1739-entry table (reference tests/librispeech/normalizers/english.json,
MIT-licensed, itself derived from tysto.com's UK-US spelling list).  The
table is pure compatibility DATA — reproducing the normalizer's behavior
requires the identical mapping — so it is vendored as a regenerable
artifact, the same pattern as formats/iq_grids.npz.

Usage: python tools/gen_spelling_map.py [reference_json] [out_json]
"""

import json
import pathlib
import sys

REF = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else
                   "/root/reference/tests/librispeech/normalizers/english.json")
OUT = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else
                   pathlib.Path(__file__).resolve().parents[1]
                   / "whisper_tpu" / "evals" / "data"
                   / "english_spellings.json")

mapping = json.loads(REF.read_text())
assert all(isinstance(k, str) and isinstance(v, str)
           for k, v in mapping.items())
OUT.parent.mkdir(parents=True, exist_ok=True)
OUT.write_text(json.dumps(dict(sorted(mapping.items())), indent=0,
                          ensure_ascii=False) + "\n")
print(f"wrote {len(mapping)} spellings -> {OUT}")
