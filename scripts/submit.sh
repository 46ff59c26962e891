#!/usr/bin/env bash
# Package kiri_ocr_spark and run the extraction job via spark-submit
# --py-files (north_star shipping contract). Extra args pass through to
# scripts/extract_job.py. For a real cluster prepend e.g.
#   KIRI_SUBMIT_ARGS="--master yarn --deploy-mode cluster --num-executors 200"
# (NOT SPARK_SUBMIT_OPTS — Spark reserves that for driver JVM options.)
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/kiri_ocr_spark.zip"
(cd "$REPO" && python -c "
import zipfile, pathlib
zf = zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('kiri_ocr_spark').rglob('*.py')):
    zf.write(p, str(p))
zf.close()
print('packaged', '$ZIP')
")

# Trained-recognizer artifacts ship via --files (the S3/S4 shipping
# contract): npz + _meta.json + vocab.json land flat in every executor's
# SparkFiles dir, where load_model resolves the bare name the zipped
# package returns from trained_model_path().
FILES=""
for f in trained_full.npz trained_full_meta.json \
         trained_small.npz trained_small_meta.json vocab.json; do
    [[ -f "$REPO/models/$f" ]] && FILES="${FILES:+$FILES,}$REPO/models/$f"
done

exec spark-submit \
    ${KIRI_SUBMIT_ARGS:---master "local[${SPARK_GRAFT_CPUS:-8}]"} \
    --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-32}" \
    --py-files "$ZIP" \
    ${FILES:+--files "$FILES"} \
    "$REPO/scripts/extract_job.py" "$@"
