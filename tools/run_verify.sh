#!/bin/bash
# Local harness: run a graft main directly on compiled classes (no sbt JVM
# startup), mirroring build.sbt's JDK17 add-opens flags.
set -e
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADDOPENS -Xmx${GRAFT_XMX:-12g} -XX:ReservedCodeCacheSize=1g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "${GRAFT_CLASSPATH:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*" "$@"
