"""Miniature in-process RESP2 server for RedisStore tests.

Implements exactly the command set the client emits (PING/SELECT/SET/GET/
HSET/HGET/EXISTS/FLUSHDB) over real sockets, binary-safe, one thread per
connection — the stand-in for the reference's integration Redis
(reference tests/serving/conftest.py:29-36). Also exposes fault hooks:
``drop_connections()`` severs every live connection (reconnect tests) and
``fail_next(n)`` makes the next n commands return RESP errors.
"""
import socket
import threading


class FakeRespServer:
    def __init__(self):
        self._data = {}
        self._lock = threading.Lock()
        self._conns = []
        self._fail_next = 0
        self.commands = []  # (name, args) log for emission assertions
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        self._alive = True
        self._thread = threading.Thread(target=self._accept, daemon=True)
        self._thread.start()

    # ---------------------------------------------------------- fault hooks
    def drop_connections(self):
        with self._lock:
            for c in self._conns:
                try:
                    c.shutdown(socket.SHUT_RDWR)
                except OSError:
                    pass
                c.close()
            self._conns.clear()

    def fail_next(self, n=1):
        self._fail_next = n

    def close(self):
        self._alive = False
        self.drop_connections()
        self._srv.close()

    # ------------------------------------------------------------- internals
    def _accept(self):
        while self._alive:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            with self._lock:
                self._conns.append(conn)
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _serve_conn(self, conn):
        buf = b""

        def readline():
            nonlocal buf
            while b"\r\n" not in buf:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            line, buf = buf.split(b"\r\n", 1)
            return line

        def read_exact(n):
            nonlocal buf
            while len(buf) < n + 2:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            data, buf = buf[:n], buf[n + 2:]
            return data

        try:
            while True:
                line = readline()
                assert line[:1] == b"*", line
                argc = int(line[1:])
                args = []
                for _ in range(argc):
                    hdr = readline()
                    assert hdr[:1] == b"$", hdr
                    args.append(read_exact(int(hdr[1:])))
                conn.sendall(self._execute(args))
        except (ConnectionError, OSError, AssertionError):
            pass
        finally:
            conn.close()

    def _execute(self, args):
        name = args[0].decode().upper()
        self.commands.append((name, [a.decode(errors="replace")
                                     for a in args[1:]]))
        if self._fail_next > 0:
            self._fail_next -= 1
            return b"-ERR injected failure\r\n"
        d = self._data
        if name == "PING":
            return b"+PONG\r\n"
        if name == "SELECT":
            return b"+OK\r\n"
        if name == "SET":
            d[args[1]] = args[2]
            return b"+OK\r\n"
        if name == "GET":
            v = d.get(args[1])
            if v is None or isinstance(v, dict):
                return b"$-1\r\n"
            return b"$%d\r\n%s\r\n" % (len(v), v)
        if name == "HSET":
            h = d.setdefault(args[1], {})
            added = int(args[2] not in h)
            h[args[2]] = args[3]
            return b":%d\r\n" % added
        if name == "HGET":
            h = d.get(args[1])
            v = None if not isinstance(h, dict) else h.get(args[2])
            if v is None:
                return b"$-1\r\n"
            return b"$%d\r\n%s\r\n" % (len(v), v)
        if name == "EXISTS":
            return b":%d\r\n" % int(args[1] in d)
        if name == "FLUSHDB":
            d.clear()
            return b"+OK\r\n"
        return b"-ERR unknown command '%s'\r\n" % name.encode()
