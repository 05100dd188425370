#!/usr/bin/env python3
"""Per-frame ground truth for the fixtures/vp8anim animation set.

Walks each file's ANMF chunks with an independent RIFF parse, rewraps
every frame's chunk list (ALPH? + VP8|VP8L) as a standalone WebP, and
decodes it with the system libwebp: lossy frames -> luma plane via
WebPDecodeYUV (+ the A bytes of WebPDecodeRGBA when ALPH is present);
lossless frames -> green + alpha channels of WebPDecodeRGBA. Emits
expected.json rows matching graft's WebpAnim.Frame fields. A frame
libwebp cannot decode fails the script loudly.
"""
import ctypes, json, os, struct, hashlib, sys

lib = ctypes.CDLL("libwebp.so.7")
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


def u24(b, i):
    return b[i] | (b[i + 1] << 8) | (b[i + 2] << 16)


def chunks(b, start, end):
    p = start
    while p + 8 <= end:
        tag = b[p:p + 4].decode("latin1")
        ln = struct.unpack_from("<I", b, p + 4)[0]
        yield tag, p + 8, p + 8 + ln
        p += 8 + ln + (ln & 1)


def wrap(payload, w=None, h=None, with_vp8x=False):
    if with_vp8x:
        # a standalone file with ALPH must declare alpha via VP8X
        vp8x = b"\x10\x00\x00\x00" + struct.pack("<I", w - 1)[:3] + \
            struct.pack("<I", h - 1)[:3]
        payload = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x + payload
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def main():
    d = os.path.join(os.path.dirname(__file__), "..", "fixtures", "vp8anim")
    rows = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".webp"):
            continue
        b = open(os.path.join(d, name), "rb").read()
        idx = 0
        for tag, f, t in chunks(b, 12, len(b)):
            if tag != "ANMF":
                continue
            fx = u24(b, f) * 2; fy = u24(b, f + 3) * 2
            fw = u24(b, f + 6) + 1; fh = u24(b, f + 9) + 1
            dur = u24(b, f + 12); flags = b[f + 15]
            inner = b[f + 16:t]
            kind = None
            has_alph = False
            for it, _, _ in chunks(inner, 0, len(inner)):
                if it == "VP8 ":
                    kind = "lossy"
                elif it == "VP8L":
                    kind = "lossless"
                elif it == "ALPH":
                    has_alph = True
            assert kind, (name, idx)
            solo = wrap(inner, fw, fh, with_vp8x=has_alph)
            if kind == "lossy":
                dw = ctypes.c_int(); dh = ctypes.c_int()
                up = ctypes.POINTER(ctypes.c_ubyte)(); vp = ctypes.POINTER(ctypes.c_ubyte)()
                ys = ctypes.c_int(); uvs = ctypes.c_int()
                yp = lib.WebPDecodeYUV(solo, len(solo), ctypes.byref(dw), ctypes.byref(dh),
                                       ctypes.byref(up), ctypes.byref(vp),
                                       ctypes.byref(ys), ctypes.byref(uvs))
                assert yp and dw.value == fw and dh.value == fh, (name, idx)
                yr = b"".join(ctypes.string_at(ctypes.addressof(yp.contents) + r * ys.value, fw)
                              for r in range(fh))
                lib.WebPFree(yp)
                sum1 = sum(yr); md5 = hashlib.md5(yr).hexdigest()
                a_sum = -1
                if has_alph:
                    rp = lib.WebPDecodeRGBA(solo, len(solo), ctypes.byref(dw), ctypes.byref(dh))
                    assert rp, (name, idx)
                    rgba = ctypes.string_at(rp, fw * fh * 4)
                    lib.WebPFree(rp)
                    a_sum = sum(rgba[3::4])
            else:
                dw = ctypes.c_int(); dh = ctypes.c_int()
                rp = lib.WebPDecodeRGBA(solo, len(solo), ctypes.byref(dw), ctypes.byref(dh))
                assert rp and dw.value == fw and dh.value == fh, (name, idx)
                rgba = ctypes.string_at(rp, fw * fh * 4)
                lib.WebPFree(rp)
                g = bytes(rgba[1::4])
                sum1 = sum(g); md5 = hashlib.md5(g).hexdigest()
                a_sum = sum(rgba[3::4])
            rows.append({
                "file": name, "idx": idx, "x": fx, "y": fy, "w": fw, "h": fh,
                "duration_ms": dur, "blend": (flags & 2) == 0,
                "dispose": (flags & 1) != 0, "kind": kind,
                "sum1": sum1, "md5": md5, "a_sum": a_sum,
            })
            idx += 1
    with open(os.path.join(d, "expected.json"), "w") as fo:
        json.dump(rows, fo, indent=1)
    print(f"truth for {len(rows)} frames across the fixture set")


if __name__ == "__main__":
    main()
