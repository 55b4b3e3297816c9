"""`meta` action: parse/add/remove/rm-img/overwrite metadata on .frad files
(reference src/header.py).

Rewrites headers via a tempfile splice so the audio body is never decoded;
parse exports metadata to JSON plus the embedded image with a best-effort
type sniff (reference uses the `filetype` package; here a tiny magic-number
table since that package is not a baked-in dependency).
"""

from __future__ import annotations

import base64
import json
import os
import sys
import tempfile

from ..common import FRM_SIGN, SIGNATURE
from ..container import head
from ..utils.cli import (META_ADD, META_OVERWRITE, META_PARSE, META_REMOVE,
                         META_RMIMG, CliParams)
from ..utils.fmt import get_file_stem

_IMAGE_MAGIC = (
    (b"\x89PNG", "png"), (b"\xff\xd8\xff", "jpg"), (b"GIF8", "gif"),
    (b"RIFF", "webp"), (b"BM", "bmp"), (b"II*\x00", "tiff"), (b"MM\x00*", "tiff"),
)


def _sniff_ext(img: bytes) -> str:
    for magic, ext in _IMAGE_MAGIC:
        if img.startswith(magic):
            return ext
    return "image"


def modify(path: str, modtype: str, params: CliParams) -> None:
    if path == "":
        print("Input file must be given", file=sys.stderr)
        raise SystemExit(1)
    if not os.path.exists(path):
        print("Input file does not exist", file=sys.stderr)
        raise SystemExit(1)

    with open(path, "rb") as rfile:
        probe = rfile.read(64)
        head_len = 0
        if probe[0:4] == SIGNATURE:
            head_len = int.from_bytes(probe[8:16], "big")
        elif probe[0:4] == FRM_SIGN:
            pass  # headerless (frame-first) file
        else:
            print("It seems this is not a valid FrAD file.", file=sys.stderr)
            raise SystemExit(1)

        rfile.seek(0)
        head_old = rfile.read(head_len)
        meta_old, img_old = head.parser(head_old)

        if modtype == META_PARSE:
            out = []
            for key, data in meta_old:
                try:
                    value, itype = data.decode("utf-8"), "string"
                except UnicodeDecodeError:
                    value, itype = base64.b64encode(data).decode(), "base64"
                out.append({"key": key, "type": itype, "value": value})
            stem = get_file_stem(path)
            with open(f"{stem}.json", "w", encoding="utf-8") as f:
                f.write(json.dumps(out, ensure_ascii=False, indent=2))
            if img_old:
                with open(f"{stem}.{_sniff_ext(img_old)}", "wb") as f:
                    f.write(img_old)
            return

        body = tempfile.TemporaryFile()
        body.write(rfile.read())

    img = b""
    if params.image_path and os.path.exists(params.image_path):
        img = open(params.image_path, "rb").read()

    if modtype == META_ADD:
        meta_new = list(meta_old) + list(params.meta)
        img_new = img or img_old
    elif modtype == META_REMOVE:
        keys = {k for k, _ in params.meta}
        meta_new = [m for m in meta_old if m[0] not in keys]
        img_new = img_old
    elif modtype == META_RMIMG:
        meta_new = meta_old
        img_new = b""
    elif modtype == META_OVERWRITE:
        meta_new = params.meta
        img_new = img
    else:
        print("Invalid modification type.", file=sys.stderr)
        raise SystemExit(1)

    with open(path, "wb") as wfile:
        wfile.write(head.builder(meta_new, img_new))
        body.seek(0)
        while (chunk := body.read(1 << 20)):
            wfile.write(chunk)
    body.close()
