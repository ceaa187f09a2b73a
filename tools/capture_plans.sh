#!/bin/bash
# Capture .explain("formatted") output per query into plans/<round>/ files.
# Usage: tools/capture_plans.sh <classesDir> <outDir> <suffix> <query...>
# Splits graft.PlanCheck's "========== name ==========" sections into
# <outDir>/<name>_<suffix>.txt — the plan-evidence files the judge checks.
set -euo pipefail
CLASSES="$1"; OUT="$2"; SUFFIX="$3"; shift 3
mkdir -p "$OUT"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
RAW=$(mktemp /tmp/plancheck.XXXXXX)
java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:$JARS" graft.PlanCheck "$@" 2>/dev/null > "$RAW"
python3 - "$RAW" "$OUT" "$SUFFIX" <<'EOF'
import sys, re
raw, out, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
cur = None; buf = []
def flush():
    if cur and buf:
        open(f"{out}/{cur}_{suffix}.txt", "w").write("".join(buf).strip() + "\n")
for line in open(raw):
    m = re.match(r"=+ (\S+) =+", line)
    if m:
        flush(); cur = m.group(1); buf = []
    elif cur is not None:
        buf.append(line)
flush()
print("wrote plans to", out)
EOF
rm -f "$RAW"
