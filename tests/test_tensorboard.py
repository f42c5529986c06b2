"""Dependency-free TensorBoard writer: record framing + scalar round-trip."""

import struct

from next3d_tpu.utils.tensorboard import (SummaryWriter, _masked_crc, crc32c,
                                          read_scalars)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C (Castagnoli)
    assert crc32c(b'') == 0x00000000
    assert crc32c(b'123456789') == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    d = str(tmp_path / 'tb')
    w = SummaryWriter(d)
    w.add_scalar('Loss/G/loss', 1.5, global_step=3)
    w.add_scalar('Loss/D/loss', -0.25, global_step=3)
    w.add_scalar('Progress/augment', 0.125, global_step=4)
    w.close()

    import os
    files = os.listdir(d)
    assert len(files) == 1 and files[0].startswith('events.out.tfevents.')
    path = os.path.join(d, files[0])
    got = read_scalars(path)
    assert (3, 'Loss/G/loss', 1.5) in got
    assert (3, 'Loss/D/loss', -0.25) in got
    assert (4, 'Progress/augment', 0.125) in got

    # every record's framing CRCs must validate (what TensorBoard checks)
    data = open(path, 'rb').read()
    pos = 0
    n = 0
    while pos < len(data):
        header = data[pos:pos + 8]
        (length,) = struct.unpack('<Q', header)
        (hcrc,) = struct.unpack_from('<I', data, pos + 8)
        assert hcrc == _masked_crc(header)
        rec = data[pos + 12:pos + 12 + length]
        (dcrc,) = struct.unpack_from('<I', data, pos + 12 + length)
        assert dcrc == _masked_crc(rec)
        pos += 12 + length + 4
        n += 1
    assert n == 4  # file_version + 3 scalars
