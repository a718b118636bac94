#!/bin/bash
# Isolated-JVM A/B: one fresh JVM per query at sf0.1, 3 repeats each.
cd /root/repo
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
for q in "$@"; do
  echo "=== $q ==="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java -Xmx96g $OPENS \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.BenchSub "$q" 3 2>/dev/null | grep SUBBENCH
done
