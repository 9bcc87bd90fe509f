# Container packaging for the graft Spark engine.
#
# The engine is a LIBRARY-shaped Spark application: it depends only on the
# Spark distribution itself (build.sbt mounts /opt/spark/jars as the
# unmanaged classpath; there are no other runtime dependencies), so the
# deliverable is one thin jar laid on top of the official Spark image —
# no assembly/shading step, no dependency tree to reconcile.
#
#   docker build -t graft .
#   docker run --rm -v ./data:/data graft \
#     --class graft.Verify local:///opt/graft/graft.jar /data/sf0.01 /data/out
#
# On a cluster the same image serves as the Spark-on-Kubernetes
# `spark.kubernetes.container.image`; see docs/DEPLOYMENT.md for
# spark-submit invocations and 100 TB conf sizing.

# ---- build stage ----
# sbt builds the thin jar against the Spark jars shipped in the Spark
# image layer (same layout the repo's build.sbt expects).
FROM apache/spark:4.0.0-scala2.13-java17-ubuntu AS builder

USER root
RUN apt-get update && \
    apt-get install -y --no-install-recommends curl && \
    rm -rf /var/lib/apt/lists/* && \
    curl -fL https://github.com/sbt/sbt/releases/download/v1.10.7/sbt-1.10.7.tgz \
      | tar -xz -C /usr/local && \
    ln -s /usr/local/sbt/bin/sbt /usr/local/bin/sbt

WORKDIR /build
COPY build.sbt ./
COPY project/build.properties project/
COPY src/main src/main
RUN sbt -batch package && \
    cp target/scala-2.13/*.jar /graft.jar

# ---- runtime stage ----
FROM apache/spark:4.0.0-scala2.13-java17-ubuntu

COPY --from=builder /graft.jar /opt/graft/graft.jar

# The lake volume: parquet tables, checkpoints, photo sink
VOLUME ["/data"]

USER spark
ENTRYPOINT ["/opt/spark/bin/spark-submit"]
CMD ["--help"]
