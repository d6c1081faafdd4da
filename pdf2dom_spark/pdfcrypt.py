"""PDF standard security handler: transparent empty-password decryption.

The reference opens encrypted PDFs whose user password is empty without
any caller-visible difference — PDFBox's ``PDDocument.load`` runs the
standard security handler with the empty password and decrypts streams
and strings on access (Pdf2Dom itself never sees ciphertext). This module
implements the same handler from the public spec (PDF 32000-1 §7.6,
ISO 32000-2 §7.6.4 for R6) so ``pdfread`` matches that behavior:

- R2 (V1, RC4-40), R3 (V2, RC4 up to 128), R4 (V4, crypt filters:
  /V2 RC4 or /AESV2 AES-128-CBC, /Identity passthrough)
- R5 (deprecated AES-256) and R6 (V5, AES-256 with the iterated
  Algorithm-2.B hash)

The supplied password (default EMPTY — exactly the no-password open the
reference's CLI performs) is tried as the user password, then as the
owner password (Algorithm 7 recovery). Files whose password does not
match still raise ``pdfread.EncryptedPdfError``. ASCII passwords encode
identically under every revision; non-ASCII CLI passwords are encoded
UTF-8 (the R6 rule; R2-R4 writers that used another 8-bit encoding for
non-ASCII passwords would need the raw bytes).

RC4 is implemented inline (stdlib-only, tiny payloads); AES-CBC comes
from the ``cryptography`` package and is import-gated so environments
without it still read RC4-encrypted files.

Validation caveat: no external PDF encryptor exists in this sandbox, so
the test fixtures are built by running the same spec algorithms in the
encrypt direction (tests/test_pdfcrypt.py) — self-consistent end-to-end
through the real reader/kernel, but not cross-validated against another
implementation's ciphertext. The algorithms and constants are straight
from the published spec (the 32-byte padding string, Algorithms 1-7,
2.A/2.B).
"""

from __future__ import annotations

import hashlib
import struct

# Standard padding string, PDF 32000-1 Table 21 / Algorithm 2 step (a)
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


class PasswordRequiredError(ValueError):
    """Neither the empty user nor the empty owner password authenticates."""


class UnsupportedEncryptionError(ValueError):
    """Non-standard security handler or an unknown /V//R combination."""


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA); encrypt == decrypt."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _aes_cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    try:
        from cryptography.hazmat.primitives.ciphers import (Cipher,
                                                            algorithms,
                                                            modes)
    except ImportError as exc:  # pragma: no cover - present in this env
        raise UnsupportedEncryptionError(
            "AES-encrypted PDF but the 'cryptography' package is "
            "unavailable") from exc
    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    ctx = c.encryptor() if encrypt else c.decryptor()
    return ctx.update(data) + ctx.finalize()


def aes_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-CBC with the 16-byte IV prefix + PKCS#5 padding (PDF 32000-1
    §7.6.2: AESV2/AESV3 stream format)."""
    if len(data) < 16:
        return b""
    body = data[16:]
    if not body or len(body) % 16:
        # truncated ciphertext: drop the ragged tail like PDFBox's
        # best-effort read rather than erroring the whole stream
        body = body[: len(body) - (len(body) % 16)]
        if not body:
            return b""
    out = _aes_cbc(key, data[:16], body, encrypt=False)
    padn = out[-1] if out else 0
    if 1 <= padn <= 16 and len(out) >= padn:
        out = out[:-padn]
    return out


def aes_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Inverse of :func:`aes_decrypt` (fixture building + tests)."""
    padn = 16 - (len(data) % 16)
    return iv + _aes_cbc(key, iv, data + bytes([padn]) * padn, encrypt=True)


def _r2r4_file_key(pwd: bytes, o: bytes, p: int, id0: bytes, r: int,
                   length_bits: int, encrypt_metadata: bool) -> bytes:
    """Algorithm 2: password -> file encryption key (R2-R4)."""
    n = max(5, min(16, length_bits // 8))
    padded = (pwd + PAD)[:32]
    h = hashlib.md5(padded + o[:32]
                    + struct.pack("<I", p & 0xFFFFFFFF) + id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R>=3): the /U entry for a file key."""
    if r == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    x = rc4(key, h)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16


def compute_o(user_pwd: bytes, owner_pwd: bytes | None, r: int,
              length_bits: int) -> bytes:
    """Algorithm 3: the /O entry (fixture building + owner recovery).
    ``owner_pwd=None`` means UNSET — the spec then keys /O on the user
    password; an explicit ``b""`` keys it on the padded empty string
    (what a writer that pads whatever it was given produces)."""
    n = max(5, min(16, length_bits // 8))
    src = user_pwd if owner_pwd is None else owner_pwd
    key = hashlib.md5((src + PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    rc4key = key[:n]
    x = rc4(rc4key, (user_pwd + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in rc4key), x)
    return x


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """R5: one SHA-256; R6: ISO 32000-2 Algorithm 2.B iterated hash."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    if r == 5:
        return k
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = _aes_cbc(k[:16], k[16:32], k1, encrypt=True)
        k = {0: hashlib.sha256, 1: hashlib.sha384,
             2: hashlib.sha512}[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class StdSecurityHandler:
    """Authenticated standard security handler for ONE file.

    ``decrypt(data, num, gen, is_string)`` maps ciphertext to plaintext
    per the object that carries it. ``strings_encrypted``/``streams
    encrypted`` honor V4/V5 /Identity crypt filters.
    """

    def __init__(self, enc: dict, id0: bytes, resolve=lambda v: v,
                 password: bytes = b""):
        # R6 truncates the UTF-8 password to 127 bytes (ISO 32000-2
        # 7.6.4.3.3); harmless for shorter passwords on every revision
        self._pwd = password[:127]
        filt = str(resolve(enc.get("Filter")) or "")
        if filt != "Standard":
            raise UnsupportedEncryptionError(
                f"unsupported security handler /{filt}")
        self.v = int(resolve(enc.get("V", 0)) or 0)
        self.r = int(resolve(enc.get("R", 2)) or 2)
        self.length_bits = int(resolve(enc.get("Length", 40)) or 40)
        if self.v == 1:
            # V1 is 40-bit RC4 by definition; a stray /Length must not
            # widen the key (PDF 32000-1 Table 20)
            self.length_bits = 40
        o = resolve(enc.get("O"))
        u = resolve(enc.get("U"))
        self.o = o if isinstance(o, bytes) else b""
        self.u = u if isinstance(u, bytes) else b""
        p = resolve(enc.get("P"))
        # P participates in key derivation BYTE-EXACTLY — `or` fallbacks
        # would corrupt a legitimate P of 0
        self.p = int(p) if isinstance(p, (int, float)) else -1
        em = resolve(enc.get("EncryptMetadata", True))
        self.encrypt_metadata = bool(True if em is None else em)
        self.id0 = id0

        # V4/V5 crypt filters: method per stream/string class
        self._stm_cfm, self._str_cfm = self._crypt_filters(enc, resolve)

        if self.v in (1, 2, 4):
            if self.r not in (2, 3, 4):
                raise UnsupportedEncryptionError(
                    f"unsupported /R {self.r} for /V {self.v}")
            self.key = self._auth_r2r4()
        elif self.v == 5:
            if self.r not in (5, 6):
                raise UnsupportedEncryptionError(
                    f"unsupported /R {self.r} for /V 5")
            ue = resolve(enc.get("UE"))
            oe = resolve(enc.get("OE"))
            self.key = self._auth_r5r6(
                ue if isinstance(ue, bytes) else b"",
                oe if isinstance(oe, bytes) else b"")
        else:
            raise UnsupportedEncryptionError(f"unsupported /V {self.v}")

    def _crypt_filters(self, enc: dict, resolve) -> tuple[str, str]:
        self._cf_cfms: dict[str, str] = {}
        if self.v not in (4, 5):
            return ("V2", "V2")  # pre-V4: RC4 everywhere
        default = "Identity"
        cf = resolve(enc.get("CF")) or {}
        if isinstance(cf, dict):
            # Full CF map kept around: a per-stream /Crypt filter may
            # name ANY CF entry, not just the StmF/StrF defaults
            # (PDF 32000-1 7.4.10)
            for cname, centry in cf.items():
                centry = resolve(centry)
                if isinstance(centry, dict):
                    cfm = str(resolve(centry.get("CFM")) or "")
                    if cfm:
                        self._cf_cfms[str(cname)] = cfm
        out = []
        for which in ("StmF", "StrF"):
            name = str(resolve(enc.get(which)) or default)
            if name == "Identity":
                out.append("Identity")
                continue
            filt = resolve(cf.get(name)) if isinstance(cf, dict) else None
            cfm = (str(resolve(filt.get("CFM")) or "")
                   if isinstance(filt, dict) else "")
            out.append(cfm or "Identity")
        return out[0], out[1]

    # -- authentication -------------------------------------------------

    def _auth_r2r4(self) -> bytes:
        key = _r2r4_file_key(self._pwd, self.o, self.p, self.id0, self.r,
                             self.length_bits, self.encrypt_metadata)
        if self._check_u(key):
            return key
        # Algorithm 7: try the password as the OWNER password -> recover
        # the (padded) user password from /O
        n = max(5, min(16, self.length_bits // 8))
        okey = hashlib.md5((self._pwd + PAD)[:32]).digest()
        if self.r >= 3:
            for _ in range(50):
                okey = hashlib.md5(okey).digest()
        rc4key = okey[:n]
        x = self.o
        if self.r == 2:
            user_padded = rc4(rc4key, x)
        else:
            for i in range(19, -1, -1):
                x = rc4(bytes(b ^ i for b in rc4key), x)
            user_padded = x
        # the recovered password is ALREADY padded — hash it directly
        # (Algorithm 2 without the re-padding step)
        h = hashlib.md5(user_padded[:32] + self.o[:32]
                        + struct.pack("<I", self.p & 0xFFFFFFFF)
                        + self.id0)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        key = key[:n]
        if self._check_u(key):
            return key
        raise PasswordRequiredError(
            "password does not authenticate (tried as user and owner)")

    def _check_u(self, key: bytes) -> bool:
        expect = compute_u(key, self.id0, self.r)
        if self.r == 2:
            return expect == self.u[:32]
        return expect[:16] == self.u[:16]

    def _auth_r5r6(self, ue: bytes, oe: bytes) -> bytes:
        pwd = self._pwd
        u = self.u
        if len(u) >= 48:
            vsalt, ksalt = u[32:40], u[40:48]
            if _hash_2b(pwd, vsalt, b"", self.r) == u[:32] and len(ue) >= 32:
                ik = _hash_2b(pwd, ksalt, b"", self.r)
                return _aes_cbc(ik, b"\x00" * 16, ue[:32], encrypt=False)
        o = self.o
        if len(o) >= 48 and len(u) >= 48:
            vsalt, ksalt = o[32:40], o[40:48]
            if (_hash_2b(pwd, vsalt, u[:48], self.r) == o[:32]
                    and len(oe) >= 32):
                ik = _hash_2b(pwd, ksalt, u[:48], self.r)
                return _aes_cbc(ik, b"\x00" * 16, oe[:32], encrypt=False)
        raise PasswordRequiredError(
            "password does not authenticate (tried as user and owner)")

    # -- decryption ------------------------------------------------------

    def object_key(self, num: int, gen: int, aes: bool) -> bytes:
        """Algorithm 1 per-object key (R2-R4); V5 uses the file key."""
        if self.v == 5:
            return self.key
        h = hashlib.md5(self.key + struct.pack("<I", num)[:3]
                        + struct.pack("<I", gen)[:2]
                        + (b"sAlT" if aes else b""))
        if aes:
            # AES-128 always takes the full 16-byte digest; for a
            # spec-compliant AESV2 file (/Length 128) min(n+5,16) is 16
            # anyway — the clamp only saves degenerate declarations
            # (e.g. AESV2 with /Length 40) from an invalid key size
            return h.digest()
        return h.digest()[: min(len(self.key) + 5, 16)]

    def _apply(self, cfm: str, data: bytes, num: int, gen: int) -> bytes:
        if cfm == "Identity":
            return data
        if cfm in ("AESV2", "AESV3"):
            return aes_decrypt(self.object_key(num, gen, aes=True), data)
        return rc4(self.object_key(num, gen, aes=False), data)

    def named_cfm(self, name: str) -> str | None:
        """CFM of a named CF entry (per-stream /Crypt filter lookup);
        None when the name isn't declared in /Encrypt /CF."""
        return self._cf_cfms.get(name)

    def decrypt_stream(self, data: bytes, num: int, gen: int,
                       cfm: str | None = None) -> bytes:
        """Decrypt with the default StmF method, or an explicit CFM
        override (a stream-level /Crypt filter naming a CF entry)."""
        return self._apply(cfm or self._stm_cfm, data, num, gen)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self._str_cfm, data, num, gen)
