#!/usr/bin/env python3
"""Author the golden MULTIMODAL graph fixture with an INDEPENDENT
implementation of the canonical format (json.dumps(sort_keys, compact) +
sha256), like make_golden_umap.py. Covers the round-9 binary-column family:
SelectBinaryColumnOp -> ImageResizeOp -> ImageEmbedOp, ImageMetaOp,
AudioMetaOp, ExplodeFramesOp. GoldenGraphSpec fails if the canonical JSON or
any field surface drifts.

Usage: python3 tools/make_golden_multimodal.py > src/test/resources/golden_multimodal.json
"""
import hashlib
import json


def uuid(cls, fields):
    d = dict(fields)
    d["type"] = cls
    s = json.dumps(d, sort_keys=True, separators=(",", ":"))
    return cls + "_" + hashlib.sha256(s.encode("utf-8")).hexdigest()


load_fields = {"content_hash": "cafe" * 16, "file_path": "/tmp/media.parquet"}
# file_path is ExcludeFromUUID on load ops: hashed WITHOUT it
load_uuid = uuid("LoadLocalParquetDatasetOp", {"content_hash": "cafe" * 16})

img_fields = {"dataset": load_uuid, "column_name": "img"}
img_uuid = uuid("SelectBinaryColumnOp", img_fields)

meta_fields = {"image": img_uuid}
meta_uuid = uuid("ImageMetaOp", meta_fields)

resize_fields = {"image": img_uuid, "max_side": 64}
resize_uuid = uuid("ImageResizeOp", resize_fields)

embed_fields = {"image": resize_uuid, "grid": 4}
embed_uuid = uuid("ImageEmbedOp", embed_fields)

audio_sel_fields = {"dataset": load_uuid, "column_name": "audio"}
audio_sel_uuid = uuid("SelectBinaryColumnOp", audio_sel_fields)

audio_fields = {"audio": audio_sel_uuid}
audio_uuid = uuid("AudioMetaOp", audio_fields)

video_sel_fields = {"dataset": load_uuid, "column_name": "video"}
video_sel_uuid = uuid("SelectBinaryColumnOp", video_sel_fields)

frames_fields = {"video": video_sel_uuid}
frames_uuid = uuid("ExplodeFramesOp", frames_fields)


def node(cls, fields):
    d = dict(fields)
    d["type"] = cls
    return d


graph = {
    "outputs": [meta_uuid, embed_uuid, audio_uuid, frames_uuid],
    "nodes": {
        load_uuid: node("LoadLocalParquetDatasetOp", load_fields),
        img_uuid: node("SelectBinaryColumnOp", img_fields),
        meta_uuid: node("ImageMetaOp", meta_fields),
        resize_uuid: node("ImageResizeOp", resize_fields),
        embed_uuid: node("ImageEmbedOp", embed_fields),
        audio_sel_uuid: node("SelectBinaryColumnOp", audio_sel_fields),
        audio_uuid: node("AudioMetaOp", audio_fields),
        video_sel_uuid: node("SelectBinaryColumnOp", video_sel_fields),
        frames_uuid: node("ExplodeFramesOp", frames_fields),
    },
}
print(json.dumps(graph, indent=2))
