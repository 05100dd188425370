#!/usr/bin/env python3
"""Ground-truth the Vp8Enc.synth streams with the system libwebp.

Reads fixtures/vp8s/*.vp8 (raw VP8 key frames written by
`Test/runMain graft.Vp8SynthDump`), wraps each in a minimal RIFF/WEBP
container, decodes with libwebp, and writes <name>.yuv (Y then U then V
rows, cropped) next to it. A stream libwebp rejects is reported and its
.yuv removed — the Scala side must then also reject it.
"""
import ctypes, os, sys, struct

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def wrap(vp8):
    chunk = b"VP8 " + struct.pack("<I", len(vp8)) + vp8
    if len(vp8) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def main():
    d = os.path.join(os.path.dirname(__file__), "..", "fixtures", "vp8s")
    ok = bad = 0
    for name in sorted(os.listdir(d)):
        if not name.endswith(".vp8"):
            continue
        vp8 = open(os.path.join(d, name), "rb").read()
        webp = wrap(vp8)
        dw = ctypes.c_int(); dh = ctypes.c_int()
        up = ctypes.POINTER(ctypes.c_ubyte)(); vp = ctypes.POINTER(ctypes.c_ubyte)()
        ys = ctypes.c_int(); uvs = ctypes.c_int()
        yp = lib.WebPDecodeYUV(webp, len(webp), ctypes.byref(dw), ctypes.byref(dh),
                               ctypes.byref(up), ctypes.byref(vp),
                               ctypes.byref(ys), ctypes.byref(uvs))
        yuv_path = os.path.join(d, name[:-4] + ".yuv")
        if not yp:
            print("REJECTED by libwebp:", name)
            if os.path.exists(yuv_path):
                os.remove(yuv_path)
            bad += 1
            continue
        w, h = dw.value, dh.value
        cw, ch = (w + 1) // 2, (h + 1) // 2
        yrows = b"".join(ctypes.string_at(ctypes.addressof(yp.contents) + r * ys.value, w)
                         for r in range(h))
        urows = b"".join(ctypes.string_at(ctypes.addressof(up.contents) + r * uvs.value, cw)
                         for r in range(ch))
        vrows = b"".join(ctypes.string_at(ctypes.addressof(vp.contents) + r * uvs.value, cw)
                         for r in range(ch))
        lib.WebPFree(yp)
        with open(yuv_path, "wb") as f:
            f.write(yrows + urows + vrows)
        ok += 1
    print(f"truth written for {ok} streams, {bad} rejected")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
