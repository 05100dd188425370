#!/usr/bin/env python3
"""Lossy WebP WITH ALPHA fixtures (VP8X + ALPH + VP8) and ground truth.

Same contract as gen_vp8_fixtures.py: the system libwebp encodes
deterministic RGBA patterns (WebPEncodeRGBA -> ALPH chunk, lossless-
compressed alpha + lossy VP8 color), then ITS OWN decoders provide the
truth — WebPDecodeYUV for the color planes and the A bytes of
WebPDecodeRGBA for the alpha plane (alpha is carried unconverted, so
those bytes ARE the decoded ALPH plane). Writes fixtures/vp8a/
<name>.webp + <name>.yuva (Y rows, U rows, V rows, A rows) +
expected.json.
"""
import ctypes, json, os, hashlib

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_float,
                               ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]


def pattern(pid, w, h):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 4
            buf[i] = (x * 5 + y * 3 + pid * 17) % 256
            buf[i + 1] = ((x // 8) * 47 + y * 7) % 256
            buf[i + 2] = (x + y * 11 + pid * 29) % 256
            if pid % 3 == 0:      # smooth alpha ramp
                buf[i + 3] = (x * 4 + y * 2) % 256
            elif pid % 3 == 1:    # hard-edged alpha blocks
                buf[i + 3] = 255 if ((x // 8) + (y // 8)) % 2 == 0 else 32
            else:                 # mostly-opaque with a gradient hole
                buf[i + 3] = 255 if x > w // 2 else (x * 8 + y) % 256
    return bytes(buf)


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "fixtures", "vp8a")
    os.makedirs(out_dir, exist_ok=True)
    meta = []
    pid = 0
    for (w, h) in [(16, 16), (32, 32), (48, 32), (33, 17), (64, 48), (96, 64)]:
        for q in (50.0, 75.0, 90.0):
            rgba = pattern(pid, w, h)
            out = ctypes.POINTER(ctypes.c_ubyte)()
            n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
            assert n > 0
            webp = ctypes.string_at(out, n)
            lib.WebPFree(out)
            assert b"ALPH" in webp, (pid, w, h, q)
            name = f"a{pid:02d}_{w}x{h}_q{int(q)}"
            with open(os.path.join(out_dir, name + ".webp"), "wb") as f:
                f.write(webp)
            dw = ctypes.c_int(); dh = ctypes.c_int()
            up = ctypes.POINTER(ctypes.c_ubyte)(); vp = ctypes.POINTER(ctypes.c_ubyte)()
            ys = ctypes.c_int(); uvs = ctypes.c_int()
            yp = lib.WebPDecodeYUV(webp, n, ctypes.byref(dw), ctypes.byref(dh),
                                   ctypes.byref(up), ctypes.byref(vp),
                                   ctypes.byref(ys), ctypes.byref(uvs))
            assert yp and dw.value == w and dh.value == h
            cw, ch = (w + 1) // 2, (h + 1) // 2
            yr = b"".join(ctypes.string_at(ctypes.addressof(yp.contents) + r * ys.value, w)
                          for r in range(h))
            ur = b"".join(ctypes.string_at(ctypes.addressof(up.contents) + r * uvs.value, cw)
                          for r in range(ch))
            vr = b"".join(ctypes.string_at(ctypes.addressof(vp.contents) + r * uvs.value, cw)
                          for r in range(ch))
            lib.WebPFree(yp)
            rp = lib.WebPDecodeRGBA(webp, n, ctypes.byref(dw), ctypes.byref(dh))
            assert rp
            rgba_out = ctypes.string_at(rp, w * h * 4)
            lib.WebPFree(rp)
            ar = bytes(rgba_out[3::4])
            with open(os.path.join(out_dir, name + ".yuva"), "wb") as f:
                f.write(yr + ur + vr + ar)
            meta.append({
                "file": name + ".webp", "w": w, "h": h,
                "y_sum": sum(yr), "u_sum": sum(ur), "v_sum": sum(vr),
                "a_sum": sum(ar),
                "y_md5": hashlib.md5(yr).hexdigest(),
                "a_md5": hashlib.md5(ar).hexdigest(),
            })
            print(name, "bytes", n, "a_sum", meta[-1]["a_sum"])
            pid += 1
    with open(os.path.join(out_dir, "expected.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("wrote", len(meta), "alpha fixtures")


if __name__ == "__main__":
    main()
