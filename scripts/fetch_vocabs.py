"""Fetch-once script for the real tokenizer vocabularies.

This build environment has no network egress, so the two public vocabulary
files cannot ship in-repo.  Run this script on any machine with internet to
place them where the framework (and tests/test_tokenizer_golden.py) look:

  uniir_tpu/data/tokenizers/bpe_simple_vocab_16e6.txt.gz
      CLIP byte-level BPE merges (reference consumes it via the `clip`
      package, src/models/uniir_clip/clip_scorefusion/clip_sf.py:26).
  uniir_tpu/data/tokenizers/bert_base_uncased_vocab.txt
      bert-base-uncased WordPiece vocab, 30522 lines (reference
      src/models/uniir_blip/backbone/blip.py:221-226).

Both are also accepted from the UNIIR_CLIP_BPE / UNIIR_BERT_VOCAB env vars.
"""

from __future__ import annotations

import hashlib
import os
import sys
import urllib.request

HERE = os.path.join(os.path.dirname(__file__), "..", "uniir_tpu", "data", "tokenizers")

FILES = [
    {
        "url": "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz",
        "dest": os.path.join(HERE, "bpe_simple_vocab_16e6.txt.gz"),
        # published alongside the OpenAI CLIP repo; verify on first fetch and
        # update here if the upstream file is ever re-encoded
        "sha256": "924691ac288e54409236115652ad4aa250f48203de50a9e4722a6ecd48d6804a",
    },
    {
        "url": "https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt",
        "dest": os.path.join(HERE, "bert_base_uncased_vocab.txt"),
        "sha256": None,  # HF does not pin; sanity check is the 30522-line count
        "expect_lines": 30522,
    },
]


def main() -> int:
    rc = 0
    for spec in FILES:
        dest = os.path.abspath(spec["dest"])
        if os.path.exists(dest):
            print(f"exists: {dest}")
            continue
        print(f"fetching {spec['url']} -> {dest}")
        try:
            urllib.request.urlretrieve(spec["url"], dest)
        except Exception as e:
            print(f"  FAILED: {e}")
            rc = 1
            continue
        data = open(dest, "rb").read()
        if spec.get("sha256"):
            got = hashlib.sha256(data).hexdigest()
            if got != spec["sha256"]:
                print(f"  WARNING: sha256 {got} != pinned {spec['sha256']} — inspect before use")
        if spec.get("expect_lines"):
            n = data.decode("utf-8").count("\n")
            if n not in (spec["expect_lines"], spec["expect_lines"] - 1):
                print(f"  WARNING: {n} lines, expected {spec['expect_lines']}")
        print("  ok")
    return rc


if __name__ == "__main__":
    sys.exit(main())
