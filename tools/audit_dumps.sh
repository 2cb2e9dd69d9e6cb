#!/bin/sh
# Full dump-surface audit: value compare + bit-level floats + sort-key
# hygiene over one Verify output tree.
#   tools/audit_dumps.sh <sfDir> <verifyOutDir> [nameFilter]
# Exit nonzero if ANY audit fails. Builder-side tool only.
set -e
SF="$1"; OUT="$2"; FILTER="${3:-}"
DIR="$(dirname "$0")"
python3 "$DIR/check_oracle.py" "$SF" "$OUT" $FILTER
python3 "$DIR/check_float_bits.py" "$SF" "$OUT"
python3 "$DIR/check_order_keys.py" "$OUT"
echo "== audit_dumps: all three audits green =="
