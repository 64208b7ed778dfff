#!/bin/bash
# One-command reference cross-check (VERDICT r4 task 7): the day the
# reference mount populates, this converts one real checkpoint, asserts
# the entropy-coding tables build, and diffs one bitstream end-to-end.
# Until then it dry-runs the SAME chain against the synthetic SavedModel
# (tools/make_reference_savedmodel.py), so the harness stays warm.
#
#   bash tools/verify_reference.sh [SAVED_MODEL_DIR] [FAMILY]
#
# Exit 0 = every check green. Steps:
#   1. locate a reference SavedModel (arg, /root/reference scan, or the
#      synthetic one — synthetic is clearly labeled DRY-RUN)
#   2. tools/convert_reference.py — raises on any unmapped/unconsumed
#      variable (a silent partial mapping is the round-1 failure mode)
#   3. compress/decompress a PNG with the converted checkpoint:
#      determinism (same input -> byte-identical .tfci), table build,
#      decode round trip
#   4. if the reference mount carries *.tfci (or *.bin) golden
#      bitstreams, decode each and byte-compare our re-encode
set -eu
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}
TFCI="python -m compression_tpu.cli.tfci"
FAMILY=${2:-bmshj2018}
WORK=$(mktemp -d /tmp/verify_ref.XXXXXX)
trap 'rm -rf "$WORK"' EXIT

SM=${1:-}
MODE=real
if [ -z "$SM" ]; then
  SM=$(find /root/reference -name saved_model.pb -printf '%h\n' 2>/dev/null \
       | head -1 || true)
fi
if [ -z "$SM" ]; then
  MODE=dry-run
  echo "== no reference SavedModel found: building the SYNTHETIC one" \
       "(DRY-RUN — re-run against the mount when it populates) =="
  SM=$WORK/ref_sm
  python tools/make_reference_savedmodel.py --family "$FAMILY" --out "$SM"
fi
echo "== [$MODE] SavedModel: $SM (family $FAMILY) =="

# Registry name the converted checkpoint serves under.
case "$FAMILY" in
  bls2017)   NAME=bls2017-factorized-mse ;;
  bmshj2018) NAME=bmshj2018-hyperprior ;;
  mbt2018)   NAME=mbt2018-mean ;;
  ms2020)    NAME=ms2020-cc10 ;;
  hific)     NAME=hific-mi ;;
  *) echo "unknown family $FAMILY"; exit 2 ;;
esac
export TPC_MODEL_DIR=$WORK/models
mkdir -p "$TPC_MODEL_DIR"

echo "== convert (raises on unmapped/unconsumed variables) =="
python tools/convert_reference.py --saved_model "$SM" --family "$FAMILY" \
  --out "$TPC_MODEL_DIR/$NAME.msgpack"

echo "== product round trip with the converted checkpoint =="
python - "$WORK/in.png" <<'EOF'
import sys
import numpy as np
from PIL import Image
a = np.zeros((256, 256, 3), np.uint8)
a[:, :, 0] = np.linspace(0, 255, 256, dtype=np.uint8)[None, :]
a[:, :, 1] = np.linspace(0, 255, 256, dtype=np.uint8)[:, None]
a[64:128, 64:192] = [210, 40, 90]
Image.fromarray(a).save(sys.argv[1])
EOF
$TFCI compress "$NAME" "$WORK/in.png" "$WORK/a.tfci"
$TFCI compress "$NAME" "$WORK/in.png" "$WORK/b.tfci"
cmp "$WORK/a.tfci" "$WORK/b.tfci" \
  && echo "determinism: byte-identical re-encode OK"
$TFCI decompress "$WORK/a.tfci" "$WORK/out.png"
python - "$WORK/in.png" "$WORK/out.png" <<'EOF'
import sys
import numpy as np
from PIL import Image
a = np.asarray(Image.open(sys.argv[1]), np.float32)
b = np.asarray(Image.open(sys.argv[2]), np.float32)
assert a.shape == b.shape, (a.shape, b.shape)
mse = float(np.mean((a - b) ** 2))
psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
print(f"round trip decode OK (psnr {psnr:.2f} dB vs original)")
EOF

echo "== golden reference bitstreams (if the mount carries any) =="
found=0
while IFS= read -r gold; do
  found=1
  echo "-- decode + re-encode diff: $gold"
  $TFCI decompress "$gold" "$WORK/gold.png"
  $TFCI compress "$NAME" "$WORK/gold.png" "$WORK/gold2.tfci"
  if cmp -s "$gold" "$WORK/gold2.tfci"; then
    echo "   byte-exact re-encode MATCH"
  else
    echo "   MISMATCH (decode worked; re-encode differs — inspect" \
         "coder version / table precision)"
    exit 1
  fi
done < <(find /root/reference -name '*.tfci' 2>/dev/null | head -5)
[ "$found" = 0 ] && echo "(none found — skipped; re-run when the mount populates)"

echo "== verify_reference [$MODE]: ALL GREEN =="
