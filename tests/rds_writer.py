"""Minimal RDS (version-2 XDR) writer, used to fabricate `KFAS::SSModel`
fixtures for the `as_bssm` round-trip tests — the image has no R, so the
serialized bytes are produced here in the same SEXP grammar
`bssm_tpu.utils.rdata` parses (REALSXP/STRSXP/VECSXP + dim/names attrs)."""
import struct

import numpy as np

_REALSXP, _CHARSXP, _STRSXP, _VECSXP, _LISTSXP, _SYMSXP = 14, 9, 16, 19, 2, 1
_NILVALUE = 254
_HAS_ATTR, _HAS_TAG = 1 << 9, 1 << 10


def _flags(ptype, has_attr=False, has_tag=False, level=0):
    f = ptype | (level << 12)
    if has_attr:
        f |= _HAS_ATTR
    if has_tag:
        f |= _HAS_TAG
    return struct.pack(">I", f)


def _sym(name: str) -> bytes:
    # fresh symbol each time (the reader's ref table tolerates duplicates)
    b = name.encode()
    return (_flags(_SYMSXP) + _flags(_CHARSXP)
            + struct.pack(">i", len(b)) + b)


def _attr_pairlist(attrs: dict) -> bytes:
    out = b""
    for k, v in attrs.items():
        out += _flags(_LISTSXP, has_tag=True) + _sym(k) + _obj(v)
    return out + _flags(_NILVALUE)


def _obj(v, attrs: dict | None = None) -> bytes:
    has_attr = bool(attrs)
    if isinstance(v, str):
        b = v.encode()
        return (_flags(_STRSXP, has_attr) + struct.pack(">i", 1)
                + _flags(_CHARSXP) + struct.pack(">i", len(b)) + b
                + (_attr_pairlist(attrs) if has_attr else b""))
    if isinstance(v, (list, tuple)) and v and isinstance(v[0], str):
        out = _flags(_STRSXP, has_attr) + struct.pack(">i", len(v))
        for s in v:
            b = s.encode()
            out += _flags(_CHARSXP) + struct.pack(">i", len(b)) + b
        return out + (_attr_pairlist(attrs) if has_attr else b"")
    a = np.asarray(v, np.float64)
    all_attrs = dict(attrs or {})
    if a.ndim > 1:
        all_attrs.setdefault("dim", np.asarray(a.shape, np.float64))
        a = np.asarray(a).reshape(-1, order="F")
    has_attr = bool(all_attrs)
    out = (_flags(_REALSXP, has_attr) + struct.pack(">i", a.size)
           + a.astype(">f8").tobytes())
    if has_attr:
        out += _attr_pairlist(all_attrs)
    return out


def _named_list(d: dict) -> bytes:
    out = _flags(_VECSXP, has_attr=True) + struct.pack(">i", len(d))
    for v in d.values():
        if isinstance(v, tuple) and len(v) == 2 and isinstance(v[1], dict):
            out += _obj(v[0], v[1])
        else:
            out += _obj(v)
    out += _attr_pairlist({"names": list(d.keys())})
    return out


def write_rds(path: str, obj: dict) -> None:
    """Serialize a named list of numeric arrays / strings as version-2 RDS."""
    body = (b"X\n" + struct.pack(">i", 2)
            + struct.pack(">i", 0x030603) + struct.pack(">i", 0x020300)
            + _named_list(obj))
    with open(path, "wb") as f:
        f.write(body)
