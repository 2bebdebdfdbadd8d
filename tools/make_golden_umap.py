#!/usr/bin/env python3
"""Author the golden UMAP graph fixture with an INDEPENDENT implementation
of the canonical format (json.dumps(sort_keys, compact) + sha256), mirroring
how src/test/resources/golden_graph.json was produced. The Scala engine must
reproduce every UUID on deserialize — GoldenGraphSpec fails if the canonical
JSON or the UMAPVizOp field surface ever drifts.

Usage: python3 tools/make_golden_umap.py > src/test/resources/golden_umap.json
"""
import hashlib
import json


def uuid(cls, fields):
    d = dict(fields)
    d["type"] = cls
    s = json.dumps(d, sort_keys=True, separators=(",", ":"))
    return cls + "_" + hashlib.sha256(s.encode("utf-8")).hexdigest()


load_fields = {"data": {"v": [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]}}
load_uuid = uuid("LoadInlineJsonDatasetOp", load_fields)

vec_fields = {"dataset": load_uuid, "column_name": "v"}
vec_uuid = uuid("SelectVectorColumnOp", vec_fields)

# every hyperparameter of reference viz_ops.py:10-52, all set to
# NON-default values so a missing/renamed field cannot hash-collide
viz_fields = {
    "input_embedding": vec_uuid,
    "n_neighbors": 30,
    "n_epochs": 500,
    "random_state": 7,
    "metric": "cosine",
    "metric_kwds": {"p": 2.0},
    "output_metric": "haversine",
    "output_metric_kwds": {"r": 6.0},
    "learning_rate": 0.5,
    "min_dist": 0.25,
    "spread": 2.0,
    "set_op_mix_ratio": 0.75,
    "local_connectivity": 2.0,
    "repulsion_strength": 1.5,
    "negative_sample_rate": 7,
    "transform_queue_size": 8.0,
    "angular_rp_forest": True,
    "target_n_neighbors": 12,
    "target_metric": "l2",
    "target_metric_kwds": {"w": 0.5},
    "target_weight": 0.25,
    "transform_seed": 99,
    "transform_mode": "graph",
    "force_approximation_algorithm": True,
    "unique": True,
    "densmap": True,
    "dens_lambda": 2.5,
    "dens_frac": 0.5,
    "dens_var_shift": 0.25,
    "output_dens": True,
    "disconnection_distance": 0.75,
}
viz_uuid = uuid("UMAPVizOp", viz_fields)


def node(cls, fields):
    d = dict(fields)
    d["type"] = cls
    return d


graph = {
    "outputs": [viz_uuid],
    "nodes": {
        load_uuid: node("LoadInlineJsonDatasetOp", load_fields),
        vec_uuid: node("SelectVectorColumnOp", vec_fields),
        viz_uuid: node("UMAPVizOp", viz_fields),
    },
}
print(json.dumps(graph, indent=2))
