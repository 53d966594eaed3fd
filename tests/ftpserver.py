"""Minimal in-process FTP server — stdlib sockets only — so
FTPFileManager (getl_spark/fsmanagers.py) gets LIVE-protocol coverage:
real control/data sockets, passive mode, MLSD facts (with an optional
pre-RFC-3659 mode that rejects MLSD to force the NLST+SIZE fallback),
and the strictest real-server rename semantics (RNTO refuses to
overwrite an existing destination), which is exactly the behavior the
manager's delete+retry fallback exists for.

Paths on the wire are virtual absolute paths mapped under ``root``.
One handler thread per control connection, so Spark-task-parallel
managers can talk to it concurrently.
"""

from __future__ import annotations

import os
import posixpath
import socket
import threading
from datetime import datetime, timezone


class FTPTestServer:
    def __init__(self, root: str, mlsd: bool = True):
        self.root = root
        self.mlsd = mlsd
        os.makedirs(root, exist_ok=True)
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind(("127.0.0.1", 0))
        self._listener.listen(8)
        self.port = self._listener.getsockname()[1]
        self._stopped = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)

    # -- lifecycle ---------------------------------------------------
    def start(self) -> "FTPTestServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stopped.set()
        try:
            self._listener.close()
        except OSError:
            pass

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
        return False

    def _accept_loop(self):
        while not self._stopped.is_set():
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return
            threading.Thread(
                target=_Session(self, conn).run, daemon=True
            ).start()

    # -- virtual fs --------------------------------------------------
    def fs_path(self, virtual: str) -> str:
        norm = posixpath.normpath("/" + (virtual or "").strip())
        return os.path.join(self.root, *[p for p in norm.split("/") if p])


class _Session:
    def __init__(self, server: FTPTestServer, conn: socket.socket):
        self.srv = server
        self.conn = conn
        self.rfile = conn.makefile("rb")
        self.pasv: socket.socket | None = None
        self.rnfr: str | None = None

    def send(self, line: str) -> None:
        self.conn.sendall((line + "\r\n").encode())

    def _data_conn(self) -> socket.socket:
        assert self.pasv is not None, "transfer command before PASV"
        self.pasv.settimeout(10)
        data, _ = self.pasv.accept()
        self.pasv.close()
        self.pasv = None
        return data

    def run(self):
        try:
            self.send("220 getl-spark test FTP ready")
            while True:
                raw = self.rfile.readline()
                if not raw:
                    return
                line = raw.decode().rstrip("\r\n")
                cmd, _, arg = line.partition(" ")
                if not self._dispatch(cmd.upper(), arg):
                    return
        except OSError:
            pass
        finally:
            try:
                self.conn.close()
            except OSError:
                pass

    def _dispatch(self, cmd: str, arg: str) -> bool:
        fs = self.srv.fs_path
        if cmd == "USER":
            self.send("331 password please")
        elif cmd == "PASS":
            self.send("230 logged in")
        elif cmd in ("TYPE", "NOOP", "OPTS"):
            self.send("200 ok")
        elif cmd == "QUIT":
            self.send("221 bye")
            return False
        elif cmd == "PASV":
            self.pasv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self.pasv.bind(("127.0.0.1", 0))
            self.pasv.listen(1)
            p = self.pasv.getsockname()[1]
            self.send(f"227 Entering Passive Mode (127,0,0,1,{p >> 8},{p & 0xFF})")
        elif cmd == "MLSD":
            if not self.srv.mlsd:
                self.send("502 MLSD not implemented")
            elif not os.path.isdir(fs(arg)):
                self.send("550 not a directory")
            else:
                self.send("150 listing")
                data = self._data_conn()
                for name in sorted(os.listdir(fs(arg))):
                    full = os.path.join(fs(arg), name)
                    mod = (
                        datetime.fromtimestamp(
                            os.path.getmtime(full), tz=timezone.utc
                        ).strftime("%Y%m%d%H%M%S")
                    )
                    if os.path.isdir(full):
                        facts = f"type=dir;modify={mod};"
                    else:
                        facts = (
                            f"type=file;size={os.path.getsize(full)};modify={mod};"
                        )
                    data.sendall(f"{facts} {name}\r\n".encode())
                data.close()
                self.send("226 done")
        elif cmd == "NLST":
            if not os.path.exists(fs(arg)):
                self.send("550 no such file or directory")
            else:
                self.send("150 names")
                data = self._data_conn()
                if os.path.isdir(fs(arg)):
                    names = sorted(os.listdir(fs(arg)))
                else:  # real servers list a file argument as itself
                    arg, names = posixpath.dirname(arg), [posixpath.basename(arg)]
                for name in names:
                    data.sendall(
                        (posixpath.join(arg or "/", name) + "\r\n").encode()
                    )
                data.close()
                self.send("226 done")
        elif cmd == "SIZE":
            if os.path.isfile(fs(arg)):
                self.send(f"213 {os.path.getsize(fs(arg))}")
            else:
                self.send("550 not a plain file")
        elif cmd == "RETR":
            if not os.path.isfile(fs(arg)):
                self.send("550 no such file")
            else:
                self.send("150 sending")
                data = self._data_conn()
                with open(fs(arg), "rb") as fh:
                    while chunk := fh.read(64 * 1024):
                        data.sendall(chunk)
                data.close()
                self.send("226 done")
        elif cmd == "STOR":
            if not os.path.isdir(os.path.dirname(fs(arg))):
                self.send("550 parent directory missing")
            else:
                self.send("150 receiving")
                data = self._data_conn()
                with open(fs(arg), "wb") as fh:
                    while chunk := data.recv(64 * 1024):
                        fh.write(chunk)
                data.close()
                self.send("226 stored")
        elif cmd == "MKD":
            try:
                os.mkdir(fs(arg))
                self.send(f'257 "{arg}" created')
            except OSError:
                self.send("550 cannot create directory")
        elif cmd == "DELE":
            try:
                os.remove(fs(arg))
                self.send("250 deleted")
            except OSError:
                self.send("550 no such file")
        elif cmd == "RNFR":
            if os.path.exists(fs(arg)):
                self.rnfr = arg
                self.send("350 ready for RNTO")
            else:
                self.send("550 no such file")
        elif cmd == "RNTO":
            if self.rnfr is None:
                self.send("503 RNFR required first")
            elif os.path.exists(fs(arg)):
                # strict real-server behavior: never overwrite — the
                # manager's delete+retry fallback must handle this
                self.send("550 destination exists")
            else:
                os.replace(fs(self.rnfr), fs(arg))
                self.rnfr = None
                self.send("250 renamed")
        else:
            self.send(f"502 {cmd} not implemented")
        return True
