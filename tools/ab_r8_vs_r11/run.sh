#!/bin/bash
# Interleaved A/B bench: r8 (A, /tmp/graft_r8) vs current HEAD (B, /root/repo)
set -u
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run_one() {  # $1=classes dir, $2=out file
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT="$2" \
  java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx48g -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
    -cp "/opt/spark/jars/*:$1" graft.Bench > /dev/null 2>&1
  echo "done $2 rc=$?"
}
cd /tmp
for i in 1 2 3; do
  run_one /tmp/graft_r8/target/scala-2.13/classes /tmp/ab_A_$i.json
  run_one /root/repo/target/scala-2.13/classes    /tmp/ab_B_$i.json
done
