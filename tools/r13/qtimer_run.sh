#!/bin/bash
# Interleaved-median window with steal bookkeeping (BASELINE.md protocol).
# usage: qtimer_run.sh <label> <reps> <query...>
set -u
LABEL=$1; shift
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
S0=$(head -1 /proc/stat)
T0=$(date +%s)
java -cp "$CP" $OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC graft.QTimer "$@" 2>/tmp/qtimer_${LABEL}.err
RC=$?
S1=$(head -1 /proc/stat)
T1=$(date +%s)
python3 - "$S0" "$S1" <<'PY'
import sys
f0=[int(x) for x in sys.argv[1].split()[1:9]]
f1=[int(x) for x in sys.argv[2].split()[1:9]]
d=sum(f1)-sum(f0); st=f1[7]-f0[7]
print(f"[window] steal_pct={100.0*st/d:.2f} over {d} jiffies")
PY
echo "[window] label=$LABEL rc=$RC wall=$((T1-T0))s"
