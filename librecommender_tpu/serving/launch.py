"""Container entry point for the serving apps (see serving_deploy/).

Reads env vars (SERVING_KIND, REDIS_HOST/PORT, ARTIFACT_PATH, PORT),
hydrates the feature store from the exported artifact directory — into
Redis when reachable, else an in-process DictStore — and serves the chosen
app. Counterpart of the reference's sanic CMD lines in
libserving/docker-compose-py.yml.
"""
import os
from pathlib import Path


def build_store(kind, artifact_path):
    from .store import (
        DictStore,
        RedisStore,
        embed2store,
        knn2store,
        online2store,
    )

    host = os.environ.get("REDIS_HOST", "")
    store = None
    if host:
        try:
            store = RedisStore(
                host=host, port=int(os.environ.get("REDIS_PORT", 6379))
            )
            store.ping()
        except Exception as exc:  # pragma: no cover - depends on env
            print(f"redis unavailable ({exc}); using in-process store")
            store = None
    if store is None:
        store = DictStore()
    loader = {
        "knn": knn2store,
        "embed": embed2store,
        "model": online2store,
        "online": online2store,
    }[kind]
    loader(Path(artifact_path), store)
    return store


def main():  # pragma: no cover - exercised in containers
    from .app import run_server

    kind = os.environ.get("SERVING_KIND", "embed")
    artifact_path = os.environ.get("ARTIFACT_PATH", "/artifacts")
    port = int(os.environ.get("PORT", 8000))
    store = build_store(kind, artifact_path)
    run_server(kind, store, port=port)


if __name__ == "__main__":  # pragma: no cover
    main()
