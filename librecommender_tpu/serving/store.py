"""Feature stores for serving: in-process dict and a minimal Redis client.

Reference parity: libserving/serialization/redis.py:21-84 (knn2redis /
embed2redis / online2redis hydration) and the Redis usage in the sanic/actix
servers. The Redis client speaks RESP over a plain socket (the `redis`
package is not in this image); the DictStore implements the same interface
for tests and single-process deployments.
"""
import json
import socket
from pathlib import Path

import numpy as np


class DictStore:
    """In-process store with the subset of Redis ops the servers use."""

    def __init__(self):
        self._data = {}

    def set(self, key, value):
        self._data[key] = value

    def get(self, key):
        return self._data.get(key)

    def hset(self, key, field, value):
        self._data.setdefault(key, {})[field] = value

    def hget(self, key, field):
        h = self._data.get(key)
        return None if h is None else h.get(field)

    def exists(self, key):
        return key in self._data

    def flushdb(self):
        self._data.clear()


class RedisStore:
    """Minimal RESP2 client: SET/GET/HSET/HGET/EXISTS/FLUSHDB/PING.

    A command issued over a broken connection (server restart, idle
    timeout) re-dials once and retries — the common deploy failure is a
    Redis bounce between hydration and the first request.
    """

    def __init__(self, host="localhost", port=6379, db=0):
        self.host, self.port, self.db = host, port, db
        self._connect()

    def _connect(self):
        self.sock = socket.create_connection((self.host, self.port))
        self.buf = b""
        if self.db:
            self._send("SELECT", str(self.db))
            self._reply()

    def _send(self, *args):
        out = [f"*{len(args)}\r\n".encode()]
        for a in args:
            data = a if isinstance(a, bytes) else str(a).encode()
            out.append(f"${len(data)}\r\n".encode() + data + b"\r\n")
        self.sock.sendall(b"".join(out))

    def _readline(self):
        while b"\r\n" not in self.buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis closed")
            self.buf += chunk
        line, self.buf = self.buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n):
        while len(self.buf) < n + 2:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis closed")
            self.buf += chunk
        data, self.buf = self.buf[:n], self.buf[n + 2 :]
        return data

    def _reply(self):
        line = self._readline()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return rest.decode()
        if t == b"-":
            raise RuntimeError(rest.decode())
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            return None if n == -1 else self._read_exact(n)
        if t == b"*":
            n = int(rest)
            return None if n == -1 else [self._reply() for _ in range(n)]
        raise RuntimeError(f"bad RESP type: {line!r}")

    def _cmd(self, *args):
        try:
            self._send(*args)
            return self._reply()
        except (ConnectionError, BrokenPipeError, OSError):
            # one reconnect attempt; a second failure propagates
            self._connect()
            self._send(*args)
            return self._reply()

    def ping(self):
        return self._cmd("PING") == "PONG"

    def set(self, key, value):
        self._cmd("SET", key, json.dumps(value))

    def get(self, key):
        v = self._cmd("GET", key)
        return None if v is None else json.loads(v)

    def hset(self, key, field, value):
        self._cmd("HSET", key, field, json.dumps(value))

    def hget(self, key, field):
        v = self._cmd("HGET", key, field)
        return None if v is None else json.loads(v)

    def exists(self, key):
        return bool(self._cmd("EXISTS", key))

    def flushdb(self):
        self._cmd("FLUSHDB")


# ------------------------------------------------------------------ loaders
def _load_common(path, store):
    path = Path(path)
    with open(path / "model_meta.json") as f:
        meta = json.load(f)
    store.set("model_meta", meta)
    with open(path / "id_mapping.json") as f:
        ids = json.load(f)
    store.set("user2id", ids["user2id"])
    store.set("id2item", ids["id2item"])
    with open(path / "user_consumed.json") as f:
        store.set("user_consumed", json.load(f))
    return meta


def knn2store(path, store):
    """Hydrate top-k sims (reference redis.py:21 `knn2redis`)."""
    meta = _load_common(path, store)
    arrays = np.load(Path(path) / "knn_sims.npz", allow_pickle=True)
    store.set("cf_mode", str(arrays["cf_mode"][0]))
    sim_ids, sim_vals = arrays["sim_ids"], arrays["sim_vals"]
    for r in range(sim_ids.shape[0]):
        valid = sim_ids[r] >= 0
        store.hset("k_sims", str(r), [
            [int(i), float(s)] for i, s in zip(sim_ids[r][valid], sim_vals[r][valid])
        ])
    inter = np.load(Path(path) / "interaction.npz")
    store.set("interaction", {
        "data": inter["data"].tolist(),
        "indices": inter["indices"].tolist(),
        "indptr": inter["indptr"].tolist(),
    })
    return meta


def embed2store(path, store):
    """Hydrate embeddings (reference redis.py:42 `embed2redis`)."""
    meta = _load_common(path, store)
    arrays = np.load(Path(path) / "embeddings.npz")
    for key in ("user_embed", "item_embed"):
        mat = arrays[key]
        store.set(key + "_shape", list(mat.shape))
        store.set(key, mat.astype(float).tolist())
    return meta


def online2store(path, store):
    """Register the on-disk model dir (reference redis.py:84 `online2redis`
    — the heavyweight params stay on disk; the store holds the pointer +
    light metadata)."""
    meta = _load_common(path, store)
    store.set("model_path", str(path))
    return meta
