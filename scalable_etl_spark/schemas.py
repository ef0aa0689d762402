"""Explicit StructTypes — declared-on-read, never inferred in prod paths.

LISTEN_SCHEMA mirrors the reference's NDJSON input (reference
data/inputs/testData.txt:1, parsed at src/jobs/ingest_job.py:72-86).
"""

from __future__ import annotations

from pyspark.sql import types as T

_ADDITIONAL_INFO = T.StructType(
    [
        T.StructField("recording_msid", T.StringType()),
        T.StructField("release_msid", T.StringType()),
        T.StructField("artist_msid", T.StringType()),
        T.StructField("release_mbid", T.StringType()),
        T.StructField("recording_mbid", T.StringType()),
        T.StructField("track_mbid", T.StringType()),
        T.StructField("release_group_mbid", T.StringType()),
        T.StructField("isrc", T.StringType()),
        T.StructField("spotify_id", T.StringType()),
        T.StructField("tracknumber", T.IntegerType()),
        T.StructField("artist_mbids", T.ArrayType(T.StringType())),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("work_mbids", T.ArrayType(T.StringType())),
    ]
)

TRACK_METADATA = T.StructType(
    [
        T.StructField("track_name", T.StringType()),
        T.StructField("artist_name", T.StringType()),
        T.StructField("release_name", T.StringType()),
        T.StructField("additional_info", _ADDITIONAL_INFO),
    ]
)

LISTEN_SCHEMA = T.StructType(
    [
        T.StructField("listened_at", T.LongType()),
        T.StructField("recording_msid", T.StringType()),
        T.StructField("user_name", T.StringType()),
        T.StructField("track_metadata", TRACK_METADATA),
    ]
)

# Bronze = flattened listen (reference src/jobs/ingest_job.py:73-83).
BRONZE_COLUMNS = (
    "listened_at",
    "recording_msid",
    "user_name",
    "track_name",
    "artist_name",
    "release_name",
    "track_recording_msid",
    "track_release_msid",
    "track_artist_msid",
    "listened_date",
)
