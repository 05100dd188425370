#!/usr/bin/env python3
"""Generate VP8 (lossy WebP) real-file fixtures + ground truth.

Driver-side tooling (same class as the pyarrow parquet fixtures for
q_parquet_real): encodes deterministic RGB patterns with the system
libwebp (BSD) via ctypes, then decodes them back with libwebp's OWN
decoder and dumps the raw YUV420 planes — the decoder's normative
output per RFC 6386 (the YUV->RGB conversion is implementation-defined
and deliberately NOT part of the contract). The graft Scala decoder
(functions/Vp8.scala) must reproduce these planes bit-exactly; Vp8Spec
compares per-pixel, and q_webp_lossy's DuckDB oracle carries the
independent per-file statistics emitted here.

Usage: python3 tools/gen_vp8_fixtures.py  (writes fixtures/vp8/)
"""
import ctypes, json, os, hashlib, struct

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def pattern(pid, w, h):
    """Deterministic RGB content, varied enough to exercise modes/tokens."""
    buf = bytearray(w * h * 3)
    s = 1234567 + pid * 99991
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            if pid % 4 == 0:      # smooth gradients (intra-friendly)
                r, g, b = (x * 5 + y * 3) % 256, (x * 2 + y * 7) % 256, (x + y * 11) % 256
            elif pid % 4 == 1:    # 8x8 blocks (hard edges -> loop filter work)
                r = ((x // 8) * 47 + (y // 8) * 91) % 256
                g = ((x // 8) * 13 + (y // 8) * 57) % 256
                b = ((x // 8) * 71 + (y // 8) * 29) % 256
            elif pid % 4 == 2:    # LCG noise (dense tokens, big cats)
                s = (s * 1103515245 + 12345) & 0x7fffffff
                r = s & 255; g = (s >> 8) & 255; b = (s >> 16) & 255
            else:                 # mixed: gradient + block stripes
                r = (x * 3 + (y // 4) * 64) % 256
                g = ((x // 16) * 96 + y * 2) % 256
                b = (x * x + y) % 256
            buf[i] = r; buf[i+1] = g; buf[i+2] = b
    return bytes(buf)


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "fixtures", "vp8")
    os.makedirs(out_dir, exist_ok=True)
    cases = []
    pid = 0
    for (w, h) in [(16, 16), (32, 32), (48, 32), (33, 17), (64, 48),
                   (80, 64), (129, 65), (96, 96)]:
        for q in (10.0, 50.0, 75.0, 90.0):
            cases.append((pid, w, h, q)); pid += 1
    meta = []
    for (pid, w, h, q) in cases:
        rgb = pattern(pid, w, h)
        out = ctypes.POINTER(ctypes.c_ubyte)()
        n = lib.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
        assert n > 0, (pid, w, h, q)
        webp = ctypes.string_at(out, n)
        lib.WebPFree(out)
        name = f"f{pid:02d}_{w}x{h}_q{int(q)}"
        with open(os.path.join(out_dir, name + ".webp"), "wb") as f:
            f.write(webp)
        # ground truth: libwebp's own YUV420 reconstruction
        dw = ctypes.c_int(); dh = ctypes.c_int()
        up = ctypes.POINTER(ctypes.c_ubyte)(); vp = ctypes.POINTER(ctypes.c_ubyte)()
        ys = ctypes.c_int(); uvs = ctypes.c_int()
        yp = lib.WebPDecodeYUV(webp, n, ctypes.byref(dw), ctypes.byref(dh),
                               ctypes.byref(up), ctypes.byref(vp),
                               ctypes.byref(ys), ctypes.byref(uvs))
        assert yp and dw.value == w and dh.value == h
        cw, ch = (w + 1) // 2, (h + 1) // 2
        yrows = b"".join(ctypes.string_at(ctypes.addressof(yp.contents) + r * ys.value, w)
                         for r in range(h))
        urows = b"".join(ctypes.string_at(ctypes.addressof(up.contents) + r * uvs.value, cw)
                         for r in range(ch))
        vrows = b"".join(ctypes.string_at(ctypes.addressof(vp.contents) + r * uvs.value, cw)
                         for r in range(ch))
        lib.WebPFree(yp)
        with open(os.path.join(out_dir, name + ".yuv"), "wb") as f:
            f.write(yrows + urows + vrows)
        meta.append({
            "file": name + ".webp", "w": w, "h": h, "q": q,
            "webp_bytes": n,
            "y_md5": hashlib.md5(yrows).hexdigest(),
            "u_md5": hashlib.md5(urows).hexdigest(),
            "v_md5": hashlib.md5(vrows).hexdigest(),
            "y_sum": sum(yrows), "u_sum": sum(urows), "v_sum": sum(vrows),
            "y_min": min(yrows), "y_max": max(yrows),
        })
        print(name, "webp", n, "y_sum", meta[-1]["y_sum"])
    with open(os.path.join(out_dir, "expected.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("wrote", len(meta), "fixtures")


if __name__ == "__main__":
    main()
