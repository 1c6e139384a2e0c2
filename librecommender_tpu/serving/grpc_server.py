"""gRPC online recommendation service.

Reference parity: libserving/actix_serving/src/online_deploy_grpc.rs:38 (the
tonic gRPC endpoint). Implemented with grpc's generic handlers and JSON
payloads — no generated stubs required (the image ships protoc without the
grpc python plugin), wire-compatible with any client that calls
``/librecommender.Recommend/RecommendUser`` with a JSON-encoded request:

    {"user": ..., "n_rec": 10, "seq": [...], "user_feats": {...}}
    -> {"rec_list": [...]}
"""
import json
from concurrent import futures

import grpc

METHOD = "/librecommender.Recommend/RecommendUser"


def _serialize(obj):
    return json.dumps(obj).encode()


def _deserialize(data):
    return json.loads(data.decode())


class _Handler(grpc.GenericRpcHandler):
    def __init__(self, model):
        self.model = model

    def service(self, handler_call_details):
        if handler_call_details.method != METHOD:
            return None
        return grpc.unary_unary_rpc_method_handler(
            self._recommend,
            request_deserializer=_deserialize,
            response_serializer=_serialize,
        )

    def _recommend(self, request, context):
        user = request["user"]
        n_rec = int(request.get("n_rec", 10))
        kwargs = {}
        if request.get("seq") is not None:
            kwargs["seq"] = request["seq"]
        if request.get("user_feats") is not None:
            kwargs["user_feats"] = request["user_feats"]
        try:
            recs = self.model.recommend_user(user=user, n_rec=n_rec, **kwargs)
        except TypeError:
            recs = self.model.recommend_user(user=user, n_rec=n_rec)
        key = next(iter(recs))
        return {
            "rec_list": [
                v.item() if hasattr(v, "item") else v for v in recs[key]
            ]
        }


def serve(model, port=50051, max_workers=8):
    """Start the gRPC server; returns the server (call .stop() to shut down)."""
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    server.add_generic_rpc_handlers((_Handler(model),))
    server.add_insecure_port(f"127.0.0.1:{port}")
    server.start()
    return server


def recommend_client(port, user, n_rec=10, seq=None, user_feats=None,
                     host="127.0.0.1"):
    """Minimal client for the service (also the wire-format documentation)."""
    with grpc.insecure_channel(f"{host}:{port}") as channel:
        call = channel.unary_unary(
            METHOD,
            request_serializer=_serialize,
            response_deserializer=_deserialize,
        )
        return call(
            {"user": user, "n_rec": n_rec, "seq": seq, "user_feats": user_feats}
        )
