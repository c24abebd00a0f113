# Shared sbt-free launch env for graft mains (sourced by tools/*.sh):
# the JDK17 --add-opens set from build.sbt + the unmanaged Spark jars.
# A plain `java $GRAFT_JAVA_OPTS -cp "$GRAFT_CP" graft.X` skips the
# ~25s sbt startup AND the sbt build lock (runs in parallel with sbt).
GRAFT_JAVA_OPTS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic; do
  GRAFT_JAVA_OPTS="$GRAFT_JAVA_OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  GRAFT_JAVA_OPTS="$GRAFT_JAVA_OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
GRAFT_JAVA_OPTS="$GRAFT_JAVA_OPTS -Dspark.ui.enabled=false"
GRAFT_JAVA_OPTS="$GRAFT_JAVA_OPTS -Dspark.sql.session.timeZone=UTC"
# httpserver reads this once in a static init — command line beats any
# late System.setProperty (q297's 40ms/request Nagle stall otherwise)
GRAFT_JAVA_OPTS="$GRAFT_JAVA_OPTS -Dsun.net.httpserver.nodelay=true"
GRAFT_JAVA_OPTS="$GRAFT_JAVA_OPTS -Xmx${SPARK_DRIVER_MEM:-8g}"
GRAFT_CP="target/scala-2.13/classes:/opt/spark/jars/*"
