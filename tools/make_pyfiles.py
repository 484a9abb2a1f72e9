"""Package quickwit_spark for `spark-submit --py-files` (the north-rule
deployment path).

    python tools/make_pyfiles.py [out.zip]          # default: dist/quickwit_spark.zip
    spark-submit --py-files dist/quickwit_spark.zip \
        --master yarn --deploy-mode cluster \
        cluster_job.py ingest --index-dir s3a://bucket/idx --input s3a://bucket/pages

where cluster_job.py is two lines:

    from quickwit_spark.cli import main
    import sys; sys.exit(main(sys.argv[1:]))
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "dist", "quickwit_spark.zip"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "quickwit_spark")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ROOT))
                n += 1
    print(f"wrote {out} ({n} modules)")


if __name__ == "__main__":
    main()
