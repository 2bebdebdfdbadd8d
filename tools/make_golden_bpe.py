#!/usr/bin/env python3
"""Golden BPE graph fixture: independent canonical-JSON + sha256 authoring
for TrainBpeTokenizerOp / BpeTokenizeOp, like make_golden_multimodal.py.

Usage: python3 tools/make_golden_bpe.py > src/test/resources/golden_bpe.json
"""
import hashlib
import json


def uuid(cls, fields):
    d = dict(fields)
    d["type"] = cls
    s = json.dumps(d, sort_keys=True, separators=(",", ":"))
    return cls + "_" + hashlib.sha256(s.encode("utf-8")).hexdigest()


load_fields = {"data": {"text": ["low low", "newest newest"]}}
load_uuid = uuid("LoadInlineJsonDatasetOp", load_fields)

text_fields = {"dataset": load_uuid, "column_name": "text"}
text_uuid = uuid("SelectTextColumnOp", text_fields)

train_fields = {"text": text_uuid, "num_merges": 8}
train_uuid = uuid("TrainBpeTokenizerOp", train_fields)

tok_fields = {"tokenizer": train_uuid, "text": text_uuid}
tok_uuid = uuid("BpeTokenizeOp", tok_fields)


def node(cls, fields):
    d = dict(fields)
    d["type"] = cls
    return d


graph = {
    "outputs": [tok_uuid],
    "nodes": {
        load_uuid: node("LoadInlineJsonDatasetOp", load_fields),
        text_uuid: node("SelectTextColumnOp", text_fields),
        train_uuid: node("TrainBpeTokenizerOp", train_fields),
        tok_uuid: node("BpeTokenizeOp", tok_fields),
    },
}
print(json.dumps(graph, indent=2))
