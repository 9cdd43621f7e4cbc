"""Plain ZIP archive extraction — documents shipped as ``.zip`` bundles
(a real crawl-tail shape: reports, data drops, multi-file docs)
[R: functions/simple/main.py ⚠ — reference tree is empty; capability
reconstructed from BASELINE.json's format-matrix brief].

A zip whose central directory matches none of the known container
layouts (OOXML / ODF / EPUB markers — see sniff._sniff_zip) is a
*bundle*: each member is re-dispatched through the normative
``extract_document`` (D2 sniff + the full X1..X17 matrix apply
per member), depth 1 only.

Normative semantics:
- members in NAME order (deterministic, independent of zip insertion
  order), directories skipped;
- caps: first 16 files, 8 MiB per member (decompression-bomb guard —
  counted via the central directory's file_size before reading);
- nested archives are skipped (depth-1: a member that itself sniffs
  ``zip`` never recurses);
- a member landing in an error/unsupported status contributes nothing;
  member texts join with blank lines; an archive where NO member
  extracts raises (-> status=error for the bundle).
"""

from __future__ import annotations

import io
import zipfile

from .normalize import normalize_text

_MAX_MEMBERS = 16
_MAX_MEMBER_BYTES = 8 << 20


class _ZipError(ValueError):
    pass


def extract_zip(payload: bytes) -> str:
    """bytes (plain .zip bundle) -> plain text (see module docstring)."""
    from . import extract_document

    texts: list[str] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        infos = [i for i in zf.infolist() if not i.is_dir()]
        infos.sort(key=lambda i: i.filename)
        n_taken = 0
        for info in infos:
            if n_taken >= _MAX_MEMBERS:
                break
            if info.file_size > _MAX_MEMBER_BYTES:
                continue
            n_taken += 1
            try:
                data = zf.read(info)
            except (zipfile.BadZipFile, OSError, NotImplementedError):
                continue
            res = extract_document(data, info.filename, _depth=1)
            if res["fmt"] in ("zip", "tar"):
                continue  # depth-1: no nested archives
            if res["text"]:
                texts.append(res["text"])
    if not texts:
        raise _ZipError("no extractable members")
    return normalize_text("\n\n".join(texts))


def extract_tar(payload: bytes) -> str:
    """bytes (.tar bundle, incl. the inner of .tar.gz/.tar.bz2/.tar.xz —
    the dispatcher strips the compression wrapper first) -> plain text.

    Same normative semantics as ``extract_zip``: regular-file members in
    NAME order, first 16 members under 8 MiB each (size read from the
    header before extraction), nested archives skipped, no extractable
    member -> raise (status=error for the bundle)."""
    import tarfile

    from . import extract_document

    texts: list[str] = []
    try:
        tf = tarfile.open(fileobj=io.BytesIO(payload), mode="r:")
    except tarfile.TarError as e:
        raise _ZipError(f"bad tar: {e}") from e
    with tf:
        members = [m for m in tf.getmembers() if m.isreg()]
        members.sort(key=lambda m: m.name)
        n_taken = 0
        for m in members:
            if n_taken >= _MAX_MEMBERS:
                break
            if m.size > _MAX_MEMBER_BYTES:
                continue
            n_taken += 1
            f = tf.extractfile(m)
            if f is None:
                continue
            data = f.read(_MAX_MEMBER_BYTES + 1)
            res = extract_document(data, m.name, _depth=1)
            if res["fmt"] in ("zip", "tar"):
                continue  # depth-1: no nested archives
            if res["text"]:
                texts.append(res["text"])
    if not texts:
        raise _ZipError("no extractable members")
    return normalize_text("\n\n".join(texts))
