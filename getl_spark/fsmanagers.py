"""Filesystem managers — getl's ``files/Manager`` family behind one
protocol layer, so the file mover speaks more than local POSIX.

Reference parity (behavior, not code):
- abstract Manager API — connect/disconnect, listDir, download/upload,
  removeFile, rename, mkdirs
  (/root/reference/src/main/groovy/getl/files/Manager.groovy:288-501);
- FileManager (local, files/FileManager.groovy),
  HDFSManager (files/HDFSManager.groovy:1-389),
  FTPManager (files/FTPManager.groovy:1-508),
  SFTPManager (files/SFTPManager.groovy:1-565).

Spark-first shape: a manager is DESCRIBED by a picklable spec dict
(``{"type": "local"}``, ``{"type": "arrow-local", "root": ...}``,
``{"type": "hdfs", ...}``, ``{"type": "ftp", ...}``, ``{"type":
"sftp", ...}``). Executors never receive live sockets — each
mapInPandas task calls :func:`build_manager` on the spec and opens its
OWN connection, so a 1000-task listing/copy fans out to 1000
independent sessions instead of serializing through one (the
reference's buildListThread pool, recast as Spark tasks).

Paths are in the MANAGER'S namespace: OS paths for ``local``, paths
under ``root`` for ``arrow-local``/``hdfs``, remote paths for
``ftp``/``sftp``. The copier composes two managers (source +
destination), so local->SFTP, HDFS->local, FTP->FTP all work through
the same two-spec plan.

Atomicity: every backend lands uploads via dot-prefixed temp name +
rename (os.replace / pyarrow move / FTP RNFR+RNTO / SFTP posix-rename),
so a reader never observes a torn destination file.
"""

from __future__ import annotations

import io
import os
import posixpath
import shutil
from dataclasses import dataclass

_CHUNK = 4 * 1024 * 1024


@dataclass
class FileEntry:
    """One listing row: ``name`` is the entry's base name, ``mtime``
    unix seconds (float), ``size`` bytes (files only)."""

    name: str
    is_dir: bool
    size: int
    mtime: float


class FileManager:
    """Protocol base. Subclasses implement the primitive operations;
    ``walk`` and ``copy_to`` are derived. Managers are context
    managers (``with build_manager(spec) as m:``)."""

    sep = "/"

    # -- lifecycle ---------------------------------------------------
    def connect(self) -> None:  # idempotent
        pass

    def close(self) -> None:
        pass

    def __enter__(self):
        self.connect()
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # -- primitives (subclass responsibility) ------------------------
    def list_dir(self, path: str) -> list[FileEntry]:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def open_read(self, path: str):
        """Binary read stream."""
        raise NotImplementedError

    def write_bytes_to(self, path: str, stream) -> int:
        """Write ``stream`` (binary file-like) to ``path`` NON-atomically
        (the atomic temp+rename dance is upload()'s job). Returns bytes
        written."""
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Move within this filesystem; atomic where the backend can."""
        raise NotImplementedError

    # -- derived -----------------------------------------------------
    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)

    def split(self, path: str) -> tuple[str, str]:
        return posixpath.split(path)

    def walk(self, root: str):
        """Yield (dirpath, [FileEntry for files]) recursively —
        os.walk shape over the manager protocol."""
        try:
            entries = self.list_dir(root)
        except FileNotFoundError:
            return
        files = [e for e in entries if not e.is_dir]
        yield root, files
        for e in entries:
            if e.is_dir:
                yield from self.walk(self.join(root, e.name) if root else e.name)

    def upload(self, stream, dest: str, pid_tag: str = "") -> int:
        """Atomic landing: stream -> dot-prefixed temp beside ``dest``
        -> rename. The temp name matches no ordinary mask, so a torn
        upload is never listed as data (same contract as the local
        copier's '.<name>.__copying_<pid>')."""
        d_dir, d_name = self.split(dest)
        tmp = self.join(d_dir, f".{d_name}.__copying_{pid_tag or os.getpid()}")
        if d_dir:
            self.mkdirs(d_dir)
        try:
            n = self.write_bytes_to(tmp, stream)
            self.rename(tmp, dest)
            return n
        except Exception:
            # best-effort temp cleanup must never REPLACE the original
            # failure (ftplib/paramiko raise non-OSError exceptions for
            # a missing temp)
            try:
                self.delete(tmp)
            except Exception:
                pass
            raise

    def copy_to(self, src_path: str, dest_mgr: "FileManager", dest: str) -> int:
        """Stream one file from this manager into ``dest_mgr``
        atomically. Same-backend local pairs take the shutil fast path
        (preserves mtimes like getl's FileCopier)."""
        if isinstance(self, LocalFileManager) and isinstance(dest_mgr, LocalFileManager):
            d_dir, d_name = os.path.split(dest)
            tmp = os.path.join(d_dir, f".{d_name}.__copying_{os.getpid()}")
            os.makedirs(d_dir, exist_ok=True)
            try:
                shutil.copy2(src_path, tmp)
                os.replace(tmp, dest)
                return os.path.getsize(dest)
            except Exception:
                try:
                    os.remove(tmp)
                except OSError:
                    pass
                raise
        with self.open_read(src_path) as fh:
            return dest_mgr.upload(fh, dest)


class LocalFileManager(FileManager):
    """files/FileManager.groovy analog: the OS filesystem, paths are
    OS paths. os.walk keeps the local listing on the fast syscall
    path."""

    def list_dir(self, path: str) -> list[FileEntry]:
        out = []
        with os.scandir(path) as it:
            for e in it:
                st = e.stat(follow_symlinks=False)
                out.append(
                    FileEntry(e.name, e.is_dir(follow_symlinks=False),
                              int(st.st_size), float(st.st_mtime))
                )
        return out

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def open_read(self, path: str):
        return open(path, "rb")

    def write_bytes_to(self, path: str, stream) -> int:
        n = 0
        with open(path, "wb") as out:
            while True:
                chunk = stream.read(_CHUNK)
                if not chunk:
                    break
                out.write(chunk)
                n += len(chunk)
        return n

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete(self, path: str) -> None:
        os.remove(path)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def split(self, path: str) -> tuple[str, str]:
        return os.path.split(path)

    def walk(self, root: str):
        for dirpath, _dirs, files in os.walk(root):
            out = []
            for fn in files:
                st = os.stat(os.path.join(dirpath, fn))
                out.append(FileEntry(fn, False, int(st.st_size), float(st.st_mtime)))
            yield dirpath, out


class ArrowFileManager(FileManager):
    """Any pyarrow.fs.FileSystem behind the Manager protocol. The
    HDFS manager (files/HDFSManager.groovy analog) is exactly this
    class over ``pyarrow.fs.HadoopFileSystem``; tests drive the same
    code over SubTreeFileSystem(LocalFileSystem) — the protocol path
    is identical, only the FileSystem instance differs."""

    def __init__(self, fs):
        self.fs = fs

    def _info(self, path: str):
        from pyarrow.fs import FileType

        info = self.fs.get_file_info(path)
        if info.type == FileType.NotFound:
            raise FileNotFoundError(path)
        return info

    def list_dir(self, path: str) -> list[FileEntry]:
        from pyarrow.fs import FileSelector, FileType

        self._info(path)  # NotFound -> FileNotFoundError (walk contract)
        out = []
        for info in self.fs.get_file_info(FileSelector(path, recursive=False)):
            mtime = info.mtime.timestamp() if info.mtime is not None else 0.0
            out.append(
                FileEntry(
                    posixpath.basename(info.path.rstrip("/")),
                    info.type == FileType.Directory,
                    int(info.size or 0),
                    float(mtime),
                )
            )
        return out

    def exists(self, path: str) -> bool:
        from pyarrow.fs import FileType

        return self.fs.get_file_info(path).type != FileType.NotFound

    def is_dir(self, path: str) -> bool:
        from pyarrow.fs import FileType

        return self.fs.get_file_info(path).type == FileType.Directory

    def open_read(self, path: str):
        return self.fs.open_input_stream(path)

    def write_bytes_to(self, path: str, stream) -> int:
        n = 0
        with self.fs.open_output_stream(path) as out:
            while True:
                chunk = stream.read(_CHUNK)
                if not chunk:
                    break
                out.write(chunk)
                n += len(chunk)
        return n

    def mkdirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def delete(self, path: str) -> None:
        self.fs.delete_file(path)

    def rename(self, src: str, dst: str) -> None:
        self.fs.move(src, dst)


class FTPFileManager(FileManager):
    """files/FTPManager.groovy analog over stdlib ftplib. One control
    connection per manager instance (per Spark task). Listing prefers
    MLSD (typed facts) with an NLST+SIZE/MDTM fallback for servers
    without RFC 3659."""

    def __init__(self, host: str, port: int = 21, user: str = "anonymous",
                 password: str = "", timeout: float = 30.0, ftp_factory=None):
        self.host, self.port, self.user, self.password = host, port, user, password
        self.timeout = timeout
        self._factory = ftp_factory  # test seam: inject a fake ftplib.FTP
        self._ftp = None

    def connect(self) -> None:
        if self._ftp is not None:
            return
        if self._factory is not None:
            self._ftp = self._factory()
        else:
            import ftplib

            self._ftp = ftplib.FTP()
        self._ftp.connect(self.host, self.port, timeout=self.timeout)
        self._ftp.login(self.user, self.password)

    def close(self) -> None:
        if self._ftp is not None:
            try:
                self._ftp.quit()
            except Exception:
                pass
            self._ftp = None

    @property
    def ftp(self):
        if self._ftp is None:
            self.connect()
        return self._ftp

    def list_dir(self, path: str) -> list[FileEntry]:
        import ftplib
        from datetime import datetime, timezone

        out = []
        try:
            for name, facts in self.ftp.mlsd(path):
                if name in (".", ".."):
                    continue
                mtime = 0.0
                if "modify" in facts:
                    mtime = (
                        datetime.strptime(facts["modify"][:14], "%Y%m%d%H%M%S")
                        .replace(tzinfo=timezone.utc)
                        .timestamp()
                    )
                out.append(
                    FileEntry(name, facts.get("type") == "dir",
                              int(facts.get("size", 0)), mtime)
                )
            return out
        except ftplib.error_perm as e:
            if str(e).startswith("550"):
                raise FileNotFoundError(path) from e
            # no MLSD: NLST names, probe each with SIZE (errors -> dir)
            out = []
            for full in self.ftp.nlst(path):
                name = posixpath.basename(full)
                try:
                    size = self.ftp.size(full)
                    out.append(FileEntry(name, False, int(size or 0), 0.0))
                except ftplib.error_perm:
                    out.append(FileEntry(name, True, 0, 0.0))
            return out

    def exists(self, path: str) -> bool:
        import ftplib

        try:
            self.ftp.size(path)
            return True
        except ftplib.error_perm:
            try:
                self.ftp.nlst(path)
                return True
            except ftplib.error_perm:
                return False

    def is_dir(self, path: str) -> bool:
        import ftplib

        try:
            self.ftp.size(path)
            return False
        except ftplib.error_perm:
            return self.exists(path)

    def open_read(self, path: str):
        # STREAMING read via the raw transfer socket — retrbinary would
        # buffer the whole remote file in memory before the copy starts
        conn = self.ftp.transfercmd(f"RETR {path}")
        return _FTPReadStream(self.ftp, conn)

    def write_bytes_to(self, path: str, stream) -> int:
        pos = stream.tell() if stream.seekable() else None
        self.ftp.storbinary(f"STOR {path}", stream)
        if pos is not None:
            return stream.tell() - pos
        return 0

    def mkdirs(self, path: str) -> None:
        import ftplib

        parts = [p for p in path.split("/") if p]
        cur = "/" if path.startswith("/") else ""
        for p in parts:
            cur = cur + p if cur in ("", "/") else cur + "/" + p
            try:
                self.ftp.mkd(cur)
            except ftplib.error_perm:
                pass  # exists

    def delete(self, path: str) -> None:
        self.ftp.delete(path)

    def rename(self, src: str, dst: str) -> None:
        import ftplib
        import uuid as _uuid

        # many servers refuse RNTO onto an existing file; mirror the
        # SFTP fallback so upload() can overwrite an already-landed
        # destination (re-copy after a story gap / changed source).
        # The fallback must never destroy the landed dst on an
        # UNRELATED failure (dir write perms, quota): the old delete-
        # then-rename left NEITHER copy when the retry rename failed
        # too (ADVICE r7 #4). Instead move dst ASIDE, rename src onto
        # dst, then drop the aside copy — restoring the aside if the
        # second rename also fails, so dst survives every failure mode.
        try:
            self.ftp.rename(src, dst)
        except ftplib.error_perm:
            if not self.exists(src) or not self.exists(dst):
                raise
            aside = f"{dst}.aside-{_uuid.uuid4().hex[:8]}"
            self.ftp.rename(dst, aside)
            try:
                self.ftp.rename(src, dst)
            except ftplib.error_perm:
                try:
                    self.ftp.rename(aside, dst)  # restore the landed copy
                except ftplib.error_perm:
                    # dst name unusable (e.g. half-created): the landed
                    # bytes survive under the aside name rather than
                    # being destroyed
                    pass
                raise
            self.ftp.delete(aside)


class _FTPReadStream:
    """File-like over an FTP data connection: chunked reads, no
    whole-file buffering; close() drains the control-channel response
    so the session stays usable for the next command."""

    def __init__(self, ftp, conn):
        self._ftp, self._conn = ftp, conn
        self._fh = conn.makefile("rb")

    def read(self, n=-1):
        return self._fh.read(n)

    def seekable(self):
        return False

    def close(self):
        try:
            self._fh.close()
        finally:
            try:
                self._conn.close()
            finally:
                try:
                    self._ftp.voidresp()
                except Exception:
                    pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class SFTPFileManager(FileManager):
    """files/SFTPManager.groovy analog over paramiko. The library is
    optional in this environment: construction succeeds (specs stay
    picklable/validatable), connect() raises a clear ImportError when
    paramiko is absent."""

    def __init__(self, host: str, port: int = 22, user: str | None = None,
                 password: str | None = None, key_filename: str | None = None,
                 timeout: float = 30.0):
        self.host, self.port, self.user = host, port, user
        self.password, self.key_filename, self.timeout = password, key_filename, timeout
        self._client = None
        self._sftp = None

    def connect(self) -> None:
        if self._sftp is not None:
            return
        try:
            import paramiko
        except ImportError as e:
            raise ImportError(
                "SFTPFileManager requires paramiko (pip install paramiko); "
                "it is not bundled in this environment"
            ) from e
        self._client = paramiko.SSHClient()
        self._client.set_missing_host_key_policy(paramiko.AutoAddPolicy())
        self._client.connect(
            self.host, port=self.port, username=self.user,
            password=self.password, key_filename=self.key_filename,
            timeout=self.timeout,
        )
        self._sftp = self._client.open_sftp()

    def close(self) -> None:
        for c in (self._sftp, self._client):
            try:
                if c is not None:
                    c.close()
            except Exception:
                pass
        self._sftp = self._client = None

    @property
    def sftp(self):
        if self._sftp is None:
            self.connect()
        return self._sftp

    def list_dir(self, path: str) -> list[FileEntry]:
        import stat as _stat

        try:
            attrs = self.sftp.listdir_attr(path)
        except IOError as e:
            raise FileNotFoundError(path) from e
        return [
            FileEntry(a.filename, _stat.S_ISDIR(a.st_mode or 0),
                      int(a.st_size or 0), float(a.st_mtime or 0))
            for a in attrs
        ]

    def exists(self, path: str) -> bool:
        try:
            self.sftp.stat(path)
            return True
        except IOError:
            return False

    def is_dir(self, path: str) -> bool:
        import stat as _stat

        try:
            return _stat.S_ISDIR(self.sftp.stat(path).st_mode or 0)
        except IOError:
            return False

    def open_read(self, path: str):
        return self.sftp.open(path, "rb")

    def write_bytes_to(self, path: str, stream) -> int:
        n = 0
        with self.sftp.open(path, "wb") as out:
            while True:
                chunk = stream.read(_CHUNK)
                if not chunk:
                    break
                out.write(chunk)
                n += len(chunk)
        return n

    def mkdirs(self, path: str) -> None:
        parts = [p for p in path.split("/") if p]
        cur = "/" if path.startswith("/") else ""
        for p in parts:
            cur = cur + p if cur in ("", "/") else cur + "/" + p
            if not self.exists(cur):
                try:
                    self.sftp.mkdir(cur)
                except IOError:
                    pass  # raced
        return None

    def delete(self, path: str) -> None:
        self.sftp.remove(path)

    def rename(self, src: str, dst: str) -> None:
        # posix-rename overwrites atomically where the server supports
        # the openssh extension; plain rename otherwise
        try:
            self.sftp.posix_rename(src, dst)
        except (IOError, AttributeError):
            if self.exists(dst):
                self.sftp.remove(dst)
            self.sftp.rename(src, dst)


def build_manager(spec: dict | None) -> FileManager:
    """Construct a manager from its picklable spec. ``None`` and
    ``{"type": "local"}`` mean the OS filesystem. Executors call this
    per task — never ship live managers through closures."""
    if spec is None:
        return LocalFileManager()
    kind = spec.get("type", "local")
    if kind == "local":
        return LocalFileManager()
    if kind == "arrow-local":
        # a pyarrow view of a local subtree: paths in the manager's
        # namespace are relative to root. Same class as HDFS — this is
        # the in-sandbox stand-in that exercises the identical
        # protocol path (no os.walk/shutil anywhere).
        from pyarrow.fs import LocalFileSystem, SubTreeFileSystem

        root = spec["root"]
        os.makedirs(root, exist_ok=True)
        return ArrowFileManager(SubTreeFileSystem(root, LocalFileSystem()))
    if kind == "hdfs":
        from pyarrow.fs import HadoopFileSystem

        fs = HadoopFileSystem(
            spec.get("host", "default"), port=int(spec.get("port", 8020)),
            user=spec.get("user"),
        )
        return ArrowFileManager(fs)
    if kind == "ftp":
        return FTPFileManager(
            spec["host"], int(spec.get("port", 21)),
            spec.get("user", "anonymous"), spec.get("password", ""),
            float(spec.get("timeout", 30.0)),
        )
    if kind == "sftp":
        return SFTPFileManager(
            spec["host"], int(spec.get("port", 22)), spec.get("user"),
            spec.get("password"), spec.get("key_filename"),
            float(spec.get("timeout", 30.0)),
        )
    raise ValueError(f"unknown file manager type {kind!r}")
