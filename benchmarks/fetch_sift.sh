#!/usr/bin/env bash
# Fetch the TEXMEX ANN benchmark corpora (SIFT1M / GIST1M) for
# bench.py's real-dataset mode (BASELINE configs[0] and [4]).
#
# This repo's build environment has ZERO EGRESS, so the datasets cannot
# be fetched here — run this on a network-ful machine and point the
# bench at the result:
#
#   ./benchmarks/fetch_sift.sh /data            # downloads + unpacks
#   BENCH_SIFT=/data/sift python bench.py       # cosine (normalized,
#                                               #   in-run oracle)
#   BENCH_SIFT=/data/sift BENCH_METRIC=l2 \
#       python bench.py                         # raw vectors, published
#                                               #   groundtruth oracle
#   BENCH_DATASET=/data/gist python bench.py    # GIST1M (960-d)
#
# Layout after unpack (the TEXMEX standard, corpus-texmex.irisa.fr):
#   sift/sift_base.fvecs  sift/sift_query.fvecs
#   sift/sift_learn.fvecs sift/sift_groundtruth.ivecs
set -eu
DEST="${1:-.}"
mkdir -p "$DEST"
cd "$DEST"

fetch() {
  local name="$1"
  if [ -d "$name" ]; then
    echo "$name/ already present; skipping"
    return
  fi
  local url="ftp://ftp.irisa.fr/local/texmex/corpus/${name}.tar.gz"
  echo "fetching $url"
  curl -fLO "$url" || wget "$url"
  tar xzf "${name}.tar.gz"
  rm -f "${name}.tar.gz"
}

fetch sift   # 128-d, 1M base + 10k queries + groundtruth (~500 MB)
fetch gist   # 960-d, 1M base + 1k queries + groundtruth (~3.6 GB)
echo "done: $DEST/sift $DEST/gist"
