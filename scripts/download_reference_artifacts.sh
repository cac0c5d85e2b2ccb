#!/usr/bin/env bash
# Fetch the reference's released artifacts (reference README.md:67-131).
# Checkpoints land in ./models (the layout eval/summarize/visualize expect);
# .pth files load directly via --load (converted in place), and
# scripts/make_parity_fixture.py can freeze golden outputs from them.
set -euo pipefail
BASE="https://semantic-abstraction.cs.columbia.edu/downloads"
what="${1:-models}"
case "$what" in
  models)  # ~3.5 GB
    wget "$BASE/models.tar.lz4" -O - | tar --use-compress-program=lz4 -xf - -C ./ ;;
  dataset)  # ~269 GB THOR
    wget "$BASE/dataset.tar.lz4" -O - | tar --use-compress-program=lz4 -xf - -C ./ ;;
  nyu)  # ~53 GB
    wget "$BASE/nyu_ovssc.tar.lz4" -O - | tar --use-compress-program=lz4 -xf - -C ./ ;;
  clip)  # OpenAI ViT-B/32 weights for --clip-ckpt
    wget "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt" ;;
  *) echo "usage: $0 [models|dataset|nyu|clip]" >&2; exit 1 ;;
esac
