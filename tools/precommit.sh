#!/bin/sh
# Pre-commit verification (the round-7 postmortem rule): the tree about
# to be committed must COMPILE and pass an oracle-gate subset covering
# every query whose code changed since <ref> (default HEAD). Run this
# before EVERY commit — above all before the end-of-round snapshot; the
# snapshot must be byte-identical to a tree with a green cycle recorded.
#
#   tools/precommit.sh [ref]          # gate subset derived from git diff
#   tools/precommit.sh ref 'q(1|2)_'  # explicit regex overrides the mapper
#
# Mapper: changed queries/*.scala files contribute every qNNN literal in
# their diff hunks; a changed ops/functions/... file contributes every
# query whose builder body references the object (awk tracks the current
# "qNNN_name" -> marker while scanning each queries file). Non-query
# source changes with no mapped query fall back to a fixed smoke subset.
set -e
cd "$(dirname "$0")/.." || exit 1
REF="${1:-HEAD}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"

# Claim-chain guard: the README's gate count must equal the number of
# distinct query names actually defined in the queries maps (the
# round-8 verdict flagged a drifted "370 queries" claim).
ACTUAL=$(grep -oh '"q[0-9]*_[a-z0-9_]*" ->' src/main/scala/graft/queries/*.scala \
  | grep -oE '"q[0-9]+_[a-z0-9_]*"' | sort -u | wc -l)
MAXQ=$(grep -oh '"q[0-9]*_[a-z0-9_]*" ->' src/main/scala/graft/queries/*.scala \
  | grep -oE 'q[0-9]+' | grep -oE '[0-9]+' | sort -n | tail -1)
CLAIM=$(grep -oE 'oracle gate \([0-9]+ queries,' README.md | grep -oE '[0-9]+' | head -1)
CLAIMMAX=$(grep -oE 'q[0-9]+, every one value-checked' README.md \
  | grep -oE '[0-9]+' | head -1)
if [ "$ACTUAL" != "$CLAIM" ] || [ "$MAXQ" != "$CLAIMMAX" ]; then
  echo "[precommit] FAIL: README claims $CLAIM queries through q$CLAIMMAX," >&2
  echo "            source defines $ACTUAL through q$MAXQ — update README.md" >&2
  exit 1
fi
echo "[precommit] gate-count claim OK ($ACTUAL queries through q$MAXQ)" >&2

echo "[precommit] compiling (main + test)..." >&2
sbt -error -batch compile Test/compile

CHANGED=$(git diff --name-only "$REF" -- 'src/main/scala/*.scala'; \
          git diff --cached --name-only -- 'src/main/scala/*.scala'; \
          git ls-files --others --exclude-standard -- 'src/main/scala/*.scala') || true
CHANGED=$(printf '%s\n' "$CHANGED" | sort -u | grep . || true)
if [ -z "$CHANGED" ]; then
  echo "[precommit] no main-source changes vs $REF; compile-only PASS" >&2
  exit 0
fi

if [ -n "$2" ]; then
  QS="$2"
else
  NUMS=""
  for f in $CHANGED; do
    case "$f" in
      src/main/scala/graft/queries/*)
        # query numbers named in the changed hunks themselves
        NUMS="$NUMS $(git diff "$REF" -- "$f" | grep -oE '"q[0-9]+_' \
          | grep -oE '[0-9]+' || true)" ;;
      *)
        # object name -> queries whose builder body references it.
        # Scanned PER FILE (cur resets) so a trailing query of one file
        # is never credited with the next file's references; a
        # reference in a file's PREAMBLE (shared constants like
        # Dedup.shinglesSql feeding many oracles) conservatively maps
        # to EVERY query in that file.
        OBJ=$(basename "$f" .scala)
        for qf in src/main/scala/graft/queries/*.scala; do
          NUMS="$NUMS $(awk -v obj="$OBJ" '
            match($0, /"q[0-9]+_[a-z0-9_]*"/) {
              cur = substr($0, RSTART+2, RLENGTH-3)
              sub(/_.*/, "", cur); all[cur] = 1 }
            index($0, obj ".") { if (cur != "") print cur; else pre = 1 }
            END { if (pre) for (n in all) print n }
          ' "$qf" | sort -u || true)"
        done ;;
    esac
  done
  NUMS=$(printf '%s\n' $NUMS | grep -E '^[0-9]+$' | sort -un | tr '\n' '|' \
    | sed 's/|$//')
  if [ -z "$NUMS" ]; then
    NUMS="1|4|8"  # smoke fallback: scan, agg, join
    echo "[precommit] no query mapping found; smoke subset" >&2
  fi
  QS="q($NUMS)_"
fi

N=$(printf '%s\n' "$QS" | tr '|' '\n' | wc -l)
echo "[precommit] gate subset ($N queries): $QS" >&2
OUT=$(mktemp -d /tmp/graft_precommit_XXXXXX)
trap 'rm -rf "$OUT"' EXIT
sbt -error -batch "runMain graft.Verify $SF $OUT $QS" >/dev/null
python3 tools/check.py "$SF" "$OUT"
echo "[precommit] PASS" >&2
