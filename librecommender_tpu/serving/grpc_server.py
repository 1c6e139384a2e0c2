"""gRPC online recommendation service.

Reference parity: libserving/actix_serving/src/online_deploy_grpc.rs:38 (the
tonic gRPC endpoint). Serves TWO methods:

- ``/recommend.Recommend/GetRecommendation`` — binary protobuf on the
  reference's wire contract (protos/recommend.proto: same package,
  service, rpc and field numbers as the actix tier's proto), so clients
  generated against the reference's proto work unchanged. Message classes
  generate on first use via protoc --python_out (hash-keyed like the
  native builds; the grpc python plugin isn't needed for messages).
- ``/librecommender.Recommend/RecommendUser`` — JSON payloads for
  stub-free clients:
      {"user": ..., "n_rec": 10, "seq": [...], "user_feats": {...}}
      -> {"rec_list": [...]}
"""
import json
from concurrent import futures
from pathlib import Path

import grpc

METHOD = "/librecommender.Recommend/RecommendUser"
PROTO_METHOD = "/recommend.Recommend/GetRecommendation"

_PROTO_DIR = Path(__file__).parent / "protos"


def get_pb2():
    """Generated message classes for protos/recommend.proto (cached)."""
    import hashlib
    import subprocess
    import sys

    src = _PROTO_DIR / "recommend.proto"
    out = _PROTO_DIR / "recommend_pb2.py"
    key = hashlib.sha256(src.read_bytes()).hexdigest()
    sidecar = _PROTO_DIR / "recommend_pb2.py.build_hash"
    if not out.exists() or not sidecar.exists() or sidecar.read_text() != key:
        subprocess.run(
            ["protoc", f"--python_out={_PROTO_DIR}", f"-I{_PROTO_DIR}",
             str(src)],
            check=True, capture_output=True, text=True,
        )
        sidecar.write_text(key)
    if str(_PROTO_DIR) not in sys.path:
        sys.path.insert(0, str(_PROTO_DIR))
    import recommend_pb2

    return recommend_pb2


def _serialize(obj):
    return json.dumps(obj).encode()


def _deserialize(data):
    return json.loads(data.decode())


class _Handler(grpc.GenericRpcHandler):
    def __init__(self, model):
        self.model = model
        self.pb2 = None

    def service(self, handler_call_details):
        if handler_call_details.method == METHOD:
            return grpc.unary_unary_rpc_method_handler(
                self._recommend_json,
                request_deserializer=_deserialize,
                response_serializer=_serialize,
            )
        if handler_call_details.method == PROTO_METHOD:
            if self.pb2 is None:
                self.pb2 = get_pb2()
            return grpc.unary_unary_rpc_method_handler(
                self._recommend_proto,
                request_deserializer=self.pb2.RecRequest.FromString,
                response_serializer=self.pb2.RecResponse.SerializeToString,
            )
        return None

    def _run(self, user, n_rec, seq, user_feats):
        kwargs = {}
        if seq:
            kwargs["seq"] = seq
        if user_feats:
            kwargs["user_feats"] = user_feats
        try:
            recs = self.model.recommend_user(user=user, n_rec=n_rec, **kwargs)
        except TypeError:
            recs = self.model.recommend_user(user=user, n_rec=n_rec)
        key = next(iter(recs))
        return [v.item() if hasattr(v, "item") else v for v in recs[key]]

    def _recommend_json(self, request, context):
        items = self._run(
            request["user"], int(request.get("n_rec", 10)),
            request.get("seq"), request.get("user_feats"),
        )
        return {"rec_list": items}

    def _recommend_proto(self, request, context):
        # raw ids arrive as strings (reference contract); map to the raw id
        # space used by the model's id maps
        user = _coerce_raw_id(request.user)
        feats = {}
        for name, feat in request.user_feats.items():
            which = feat.WhichOneof("value")
            feats[name] = getattr(feat, which) if which else None
        items = self._run(
            user, int(request.n_rec or 10), list(request.seq) or None,
            feats or None,
        )
        return self.pb2.RecResponse(items=[str(i) for i in items])


def _coerce_raw_id(value):
    """Proto carries user ids as strings; integer-keyed id maps (MovieLens
    style) need the int form."""
    try:
        return int(value)
    except (TypeError, ValueError):
        return value


def serve(model, port=50051, max_workers=8):
    """Start the gRPC server; returns the server (call .stop() to shut down)."""
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    server.add_generic_rpc_handlers((_Handler(model),))
    server.add_insecure_port(f"127.0.0.1:{port}")
    server.start()
    return server


def recommend_client(port, user, n_rec=10, seq=None, user_feats=None,
                     host="127.0.0.1"):
    """Minimal JSON client for the service (also the wire-format docs)."""
    with grpc.insecure_channel(f"{host}:{port}") as channel:
        call = channel.unary_unary(
            METHOD,
            request_serializer=_serialize,
            response_deserializer=_deserialize,
        )
        return call(
            {"user": user, "n_rec": n_rec, "seq": seq, "user_feats": user_feats}
        )


def recommend_client_proto(port, user, n_rec=10, seq=None, user_feats=None,
                           host="127.0.0.1"):
    """Binary-protobuf client on the reference wire contract — what a stub
    generated from the reference's recommend.proto produces."""
    pb2 = get_pb2()
    req = pb2.RecRequest(user=str(user), n_rec=n_rec)
    if seq:
        req.seq.extend(int(s) for s in seq)
    for name, val in (user_feats or {}).items():
        if isinstance(val, str):
            req.user_feats[name].string_val = val
        elif isinstance(val, int):
            req.user_feats[name].int_val = val
        else:
            req.user_feats[name].float_val = float(val)
    with grpc.insecure_channel(f"{host}:{port}") as channel:
        call = channel.unary_unary(
            PROTO_METHOD,
            request_serializer=pb2.RecRequest.SerializeToString,
            response_deserializer=pb2.RecResponse.FromString,
        )
        return call(req)
