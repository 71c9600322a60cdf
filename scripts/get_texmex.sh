#!/usr/bin/env bash
# Fetch the TEXMEX ANN corpora (SIFT1M / GIST1M) — the datasets behind the
# reference's published baseline (reference: benchmark/turing/sift1m/README.md,
# BASELINE.md). Mirrors: ftp.irisa.fr is the canonical host; the HTTP mirror
# usually works where FTP is blocked.
#
# Usage: scripts/get_texmex.sh [sift|gist|both] [dest_dir]
# Then:  python benchmark/sweep.py \
#            --base  data/sift/sift_base.fvecs \
#            --query data/sift/sift_query.fvecs \
#            --learn data/sift/sift_learn.fvecs \
#            --name sift1m --n-probes 1 8 32 128 --ks 10 100
# (see also the queue recipe in scripts/record_sweeps7.sh)
#
# Integrity: texmex publishes no md5s; we verify structurally instead —
# every .fvecs record is [int32 d][d * f32], so file_size % (4 + 4d) == 0
# and d must match the advertised dimension (SIFT 128, GIST 960).
set -euo pipefail

WHAT="${1:-sift}"
DEST="${2:-data}"
mkdir -p "$DEST"

fetch() { # name dim
  local name="$1" dim="$2"
  local tar="$DEST/${name}.tar.gz"
  if [ ! -f "$DEST/$name/${name}_base.fvecs" ]; then
    for url in \
      "ftp://ftp.irisa.fr/local/texmex/corpus/${name}.tar.gz" \
      "http://ftp.irisa.fr/local/texmex/corpus/${name}.tar.gz"; do
      echo "fetching $url"
      if curl -fL --retry 3 -o "$tar" "$url"; then break; fi
    done
    [ -f "$tar" ] || { echo "download failed (no egress?)"; exit 1; }
    tar -xzf "$tar" -C "$DEST"
    rm -f "$tar"
  fi
  # structural verification (record framing + dimension)
  python3 - "$DEST/$name/${name}_base.fvecs" "$dim" << 'EOF'
import os, struct, sys
path, dim = sys.argv[1], int(sys.argv[2])
size = os.path.getsize(path)
with open(path, "rb") as f:
    d = struct.unpack("<i", f.read(4))[0]
assert d == dim, f"{path}: dimension {d} != expected {dim}"
rec = 4 + 4 * d
assert size % rec == 0, f"{path}: size {size} not a multiple of {rec}"
print(f"{path}: OK — {size // rec:,} vectors of d={d}")
EOF
}

case "$WHAT" in
  sift) fetch sift 128 ;;
  gist) fetch gist 960 ;;
  both) fetch sift 128; fetch gist 960 ;;
  *) echo "usage: $0 [sift|gist|both] [dest_dir]"; exit 2 ;;
esac
