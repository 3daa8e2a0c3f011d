#!/usr/bin/env bash
# Connected-machine bring-up (VERDICT r3 missing #1/#4/#5): fetch the four
# real artifacts the sandbox cannot reach, then run every bring-up stage.
# Idempotent: existing files are kept (curl -C - resumes partial fetches).
#
#   bash scripts/bringup_real_weights.sh            # fetch + all stages
#   bash scripts/bringup_real_weights.sh --dry-run  # offline structure check
#
# Artifact provenance + sha256 land in artifacts/MANIFEST.json (hashes are
# recorded at fetch time — they are not published upstream, so the first
# connected run pins them for every later run). See docs/BRINGUP.md.
set -euo pipefail
cd "$(dirname "$0")/.."
ART="${ART_DIR:-artifacts}"
mkdir -p "$ART"

if [[ "${1:-}" == "--dry-run" ]]; then
    exec python scripts/bringup_real_weights.py --dry-run
fi

fetch() { # fetch <url> <dest>
    if [[ -s "$ART/$2" ]]; then
        echo "have $2"
    else
        echo "fetching $2 ..."
        curl -fL --retry 3 -C - -o "$ART/$2" "$1"
    fi
}

# GIT-Large MSRVTT teacher (reference README.md:258-260, ~1.6 GB)
fetch "https://publicgit.blob.core.windows.net/data/output/GIT_LARGE_MSRVTT/snapshot/model.pt" \
      "model.pt"
# timm TinyViT-21M encoder (reference config.py:77)
fetch "https://huggingface.co/timm/tiny_vit_21m_224.dist_in22k_ft_in1k/resolve/main/pytorch_model.bin" \
      "tiny_vit_21m_224.bin"
# bert-base-uncased vocab (reference model.py:732)
fetch "https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt" \
      "vocab.txt"
# WordNet (METEOR synonym stage)
fetch "https://raw.githubusercontent.com/nltk/nltk_data/gh-pages/packages/corpora/wordnet.zip" \
      "wordnet.zip"

python scripts/bringup_real_weights.py --all
echo "bring-up complete; commit tests/fixtures/real_weights/ to pin the goldens"
