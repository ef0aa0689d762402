"""Seed a landing directory with synthetic NDJSON listens so the
Makefile pipeline targets run end-to-end without external data —
the shape mirrors the reference's NDJSON input contract (reference
data/inputs/testData.txt schema, parsed at src/jobs/ingest_job.py:72-86)
with generated values.

    python tools/seed_landing.py [out_dir] [n_rows]
"""

from __future__ import annotations

import json
import os
import sys


def listen(i: int) -> dict:
    user = f"user_{i % 7}"
    return {
        "listened_at": 1_700_000_000 + i * 97,
        "recording_msid": f"msid-{i:06d}",
        "user_name": user,
        "track_metadata": {
            "artist_name": f"artist_{i % 11}",
            "track_name": f"track_{i % 23}",
            "release_name": f"release_{i % 5}",
            "additional_info": {
                "recording_msid": f"msid-{i:06d}",
                "tracknumber": i % 12 + 1,
                "tags": [f"tag{i % 3}"],
            },
        },
    }


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark-graft-landing"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    os.makedirs(out_dir, exist_ok=True)
    n_files = min(4, n) or 1
    written = 0
    for f in range(n_files):
        # contiguous slices covering ALL n rows (remainder spread over
        # the first files), so every requested row is written
        start = f * n // n_files
        stop = (f + 1) * n // n_files
        path = os.path.join(out_dir, f"listens-{f:02d}.jsonl")
        with open(path, "w") as fh:
            for i in range(start, stop):
                fh.write(json.dumps(listen(i)) + "\n")
                written += 1
    print(json.dumps(
        {"out_dir": out_dir, "rows": written, "files": n_files}
    ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
