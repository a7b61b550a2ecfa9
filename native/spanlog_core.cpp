// Native span-log core: batch record encoding and recovery scanning.
//
// The reference's storage engine is its Go spanfile (spanfile.go); ours is
// the append-only span log (syzgydb_tpu/core/storage.py).  This library
// implements the two hot host-side paths in C++ so ingest and reopen are not
// bottlenecked by per-record Python work on single-core serving hosts:
//
//   slc_encode_batch : ids + streams -> one contiguous log buffer
//                      (seq numbers + CRC32 per record)
//   slc_scan         : recovery scan of a whole file image -> entry table
//                      (id offsets, seq, flags, record offset/length), CRC
//                      verified, corrupt entries skipped with magic resync —
//                      same semantics as SpanLog._recover.
//
// Binary layout (must match storage.py):
//   record := "RC01" u32(body_len) body u32(crc32(body))
//   body   := u64(seq) u8(flags) u16(id_len) id u8(nstreams)
//             (u32(len) bytes)*
//
// Exposed with a plain C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CRC32 (IEEE, zlib-compatible), slice-by-8
// ---------------------------------------------------------------------------

static uint32_t crc_tab[8][256];

static void crc_init() {
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_tab[0][i] = c;
    }
    for (uint32_t i = 0; i < 256; i++)
        for (int s = 1; s < 8; s++)
            crc_tab[s][i] =
                crc_tab[0][crc_tab[s - 1][i] & 0xFF] ^ (crc_tab[s - 1][i] >> 8);
}

// Eager init at dlopen (single-threaded) — the old lazy check raced: a
// thread could observe the done flag before the table stores were
// visible and encode a whole batch with wrong CRCs, silently discarded
// as "corrupt" at the next reopen (review finding r5).
static const bool crc_tables_ready = (crc_init(), true);

static uint32_t crc32_ieee(const uint8_t* p, size_t n, uint32_t crc = 0) {
    (void)crc_tables_ready;
    crc = ~crc;
    while (n >= 8) {
        uint32_t lo;
        uint32_t hi;
        memcpy(&lo, p, 4);
        memcpy(&hi, p + 4, 4);
        lo ^= crc;
        crc = crc_tab[7][lo & 0xFF] ^ crc_tab[6][(lo >> 8) & 0xFF] ^
              crc_tab[5][(lo >> 16) & 0xFF] ^ crc_tab[4][lo >> 24] ^
              crc_tab[3][hi & 0xFF] ^ crc_tab[2][(hi >> 8) & 0xFF] ^
              crc_tab[1][(hi >> 16) & 0xFF] ^ crc_tab[0][hi >> 24];
        p += 8;
        n -= 8;
    }
    while (n--) crc = crc_tab[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
    return ~crc;
}

uint32_t slc_crc32(const uint8_t* data, uint64_t len) {
    return crc32_ieee(data, len);
}

// ---------------------------------------------------------------------------
// Batch encode
// ---------------------------------------------------------------------------

static const char REC_MAGIC[4] = {'R', 'C', '0', '1'};

static inline void put_u32(uint8_t* p, uint32_t v) { memcpy(p, &v, 4); }
static inline void put_u64(uint8_t* p, uint64_t v) { memcpy(p, &v, 8); }
static inline void put_u16(uint8_t* p, uint16_t v) { memcpy(p, &v, 2); }

// Computes the total encoded size for a batch.
// ids: concatenated id bytes; id_lens[n]; per record `nstreams` streams whose
// lengths are in stream_lens (row-major, nstreams per record), payload bytes
// concatenated in `streams`.
uint64_t slc_encoded_size(uint64_t n, const uint32_t* id_lens,
                          uint32_t nstreams, const uint32_t* stream_lens) {
    uint64_t total = 0;
    for (uint64_t i = 0; i < n; i++) {
        uint64_t body = 8 + 1 + 2 + id_lens[i] + 1;
        for (uint32_t s = 0; s < nstreams; s++)
            body += 4 + stream_lens[i * nstreams + s];
        total += 8 + body + 4;  // magic+len, body, crc
    }
    return total;
}

// Encodes the batch into `out` (caller allocates slc_encoded_size bytes).
// Returns bytes written.  seq numbers are first_seq..first_seq+n-1.
// offsets_out[n]: offset of each record relative to the start of `out`.
// lengths_out[n]: total record length.
uint64_t slc_encode_batch(uint64_t n, uint64_t first_seq, uint8_t flags,
                          const uint8_t* ids, const uint32_t* id_lens,
                          uint32_t nstreams, const uint8_t* streams,
                          const uint32_t* stream_lens, uint8_t* out,
                          uint64_t* offsets_out, uint64_t* lengths_out) {
    uint64_t pos = 0;
    uint64_t id_off = 0;
    uint64_t stream_off = 0;
    for (uint64_t i = 0; i < n; i++) {
        uint64_t body_len = 8 + 1 + 2 + id_lens[i] + 1;
        for (uint32_t s = 0; s < nstreams; s++)
            body_len += 4 + stream_lens[i * nstreams + s];
        uint8_t* rec = out + pos;
        memcpy(rec, REC_MAGIC, 4);
        put_u32(rec + 4, (uint32_t)body_len);
        uint8_t* b = rec + 8;
        put_u64(b, first_seq + i);
        b += 8;
        *b++ = flags;
        put_u16(b, (uint16_t)id_lens[i]);
        b += 2;
        memcpy(b, ids + id_off, id_lens[i]);
        b += id_lens[i];
        id_off += id_lens[i];
        *b++ = (uint8_t)nstreams;
        for (uint32_t s = 0; s < nstreams; s++) {
            uint32_t sl = stream_lens[i * nstreams + s];
            put_u32(b, sl);
            b += 4;
            memcpy(b, streams + stream_off, sl);
            b += sl;
            stream_off += sl;
        }
        uint32_t crc = crc32_ieee(rec + 8, body_len);
        put_u32(rec + 8 + body_len, crc);
        offsets_out[i] = pos;
        lengths_out[i] = 8 + body_len + 4;
        pos += lengths_out[i];
    }
    return pos;
}

// Same record layout as slc_encode_batch, but each stream arrives as its
// own concatenated buffer (stream_bufs[s] = stream s of every record,
// back to back).  Lets the ingest path hand the vector stream over as one
// contiguous (N, row_bytes) array instead of N python-built row slices.
uint64_t slc_encode_batch_split(uint64_t n, uint64_t first_seq, uint8_t flags,
                                const uint8_t* ids, const uint32_t* id_lens,
                                uint32_t nstreams,
                                const uint8_t* const* stream_bufs,
                                const uint32_t* stream_lens, uint8_t* out,
                                uint64_t* offsets_out, uint64_t* lengths_out) {
    uint64_t pos = 0;
    uint64_t id_off = 0;
    std::vector<uint64_t> soff(nstreams, 0);
    for (uint64_t i = 0; i < n; i++) {
        uint64_t body_len = 8 + 1 + 2 + id_lens[i] + 1;
        for (uint32_t s = 0; s < nstreams; s++)
            body_len += 4 + stream_lens[i * nstreams + s];
        uint8_t* rec = out + pos;
        memcpy(rec, REC_MAGIC, 4);
        put_u32(rec + 4, (uint32_t)body_len);
        uint8_t* b = rec + 8;
        put_u64(b, first_seq + i);
        b += 8;
        *b++ = flags;
        put_u16(b, (uint16_t)id_lens[i]);
        b += 2;
        memcpy(b, ids + id_off, id_lens[i]);
        b += id_lens[i];
        id_off += id_lens[i];
        *b++ = (uint8_t)nstreams;
        for (uint32_t s = 0; s < nstreams; s++) {
            uint32_t sl = stream_lens[i * nstreams + s];
            put_u32(b, sl);
            b += 4;
            memcpy(b, stream_bufs[s] + soff[s], sl);
            b += sl;
            soff[s] += sl;
        }
        uint32_t crc = crc32_ieee(rec + 8, body_len);
        put_u32(rec + 8 + body_len, crc);
        offsets_out[i] = pos;
        lengths_out[i] = 8 + body_len + 4;
        pos += lengths_out[i];
    }
    return pos;
}

// ---------------------------------------------------------------------------
// Recovery scan
// ---------------------------------------------------------------------------

// Scans `data` (the file image after the 8-byte header) and appends one row
// per syntactically valid record.  Out arrays are caller-allocated with
// capacity `max_entries` (an upper bound is data_len / 25, the minimum record
// size).  Returns the number of entries found.  For each entry:
//   offsets[i], lengths[i] : record position/size relative to `data`
//   seqs[i]                : sequence number
//   flags_out[i]           : record flags (bit0 tombstone)
//   id_offsets[i], id_lens[i] : id string position inside `data`
// Corrupt/truncated entries are skipped by resyncing on the next magic.
uint64_t slc_scan(const uint8_t* data, uint64_t data_len, uint64_t max_entries,
                  uint64_t* offsets, uint64_t* lengths, uint64_t* seqs,
                  uint8_t* flags_out, uint64_t* id_offsets,
                  uint32_t* id_lens) {
    uint64_t pos = 0;
    uint64_t count = 0;
    while (pos + 8 <= data_len && count < max_entries) {
        bool ok = memcmp(data + pos, REC_MAGIC, 4) == 0;
        uint32_t body_len = 0;
        uint64_t end = 0;
        if (ok) {
            memcpy(&body_len, data + pos + 4, 4);
            end = pos + 8 + (uint64_t)body_len + 4;
            ok = end <= data_len && body_len >= 12;
        }
        if (ok) {
            uint32_t stored_crc;
            memcpy(&stored_crc, data + end - 4, 4);
            ok = crc32_ieee(data + pos + 8, body_len) == stored_crc;
        }
        uint16_t id_len = 0;
        if (ok) {
            memcpy(&id_len, data + pos + 8 + 9, 2);
            ok = 11u + id_len + 1u <= body_len;
        }
        if (!ok) {
            // resync on next magic
            const uint8_t* next = nullptr;
            if (pos + 1 < data_len) {
                next = (const uint8_t*)memmem(data + pos + 1, data_len - pos - 1,
                                              REC_MAGIC, 4);
            }
            if (!next) break;
            pos = (uint64_t)(next - data);
            continue;
        }
        uint64_t seq;
        memcpy(&seq, data + pos + 8, 8);
        offsets[count] = pos;
        lengths[count] = end - pos;
        seqs[count] = seq;
        flags_out[count] = data[pos + 8 + 8];
        id_offsets[count] = pos + 8 + 11;
        id_lens[count] = id_len;
        count++;
        pos = end;
    }
    return count;
}

}  // extern "C"
