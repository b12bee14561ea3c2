// Native FASTA/FASTQ(.gz) parser — the C++ read loader of the framework.
//
// Role mirror of the reference's C++ io layer
// (/root/reference/src/common/io/reads/file_reader.hpp kseq-based parsing and
// the gzip handling of ext/zlib-ng): the hot read-ingest path runs natively,
// Python only wraps the resulting flat buffers (see native/__init__.py).
//
// Layout: one growable byte pool with all sequences concatenated, one with
// all names, plus uint64 offset arrays (n+1 entries, offsets[0] == 0) — the
// same flat SoA discipline the device code uses, so a zero-copy numpy view
// can batch-encode without per-read Python objects.
//
// Build: make -C spades_tpu/native   (g++ -O3, links zlib; gzopen reads
// plain files transparently as well).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

namespace {

struct Pool {
    uint8_t *data = nullptr;
    uint64_t size = 0, cap = 0;

    bool push(const uint8_t *p, uint64_t n) {
        if (size + n > cap) {
            uint64_t ncap = cap ? cap * 2 : 1 << 20;
            while (ncap < size + n) ncap *= 2;
            auto *nd = static_cast<uint8_t *>(realloc(data, ncap));
            if (!nd) return false;
            data = nd;
            cap = ncap;
        }
        memcpy(data + size, p, n);
        size += n;
        return true;
    }
};

struct U64Vec {
    uint64_t *data = nullptr;
    uint64_t size = 0, cap = 0;

    bool push(uint64_t v) {
        if (size == cap) {
            uint64_t ncap = cap ? cap * 2 : 1 << 16;
            auto *nd = static_cast<uint64_t *>(realloc(data, ncap * 8));
            if (!nd) return false;
            data = nd;
            cap = ncap;
        }
        data[size++] = v;
        return true;
    }
};

struct Line {
    // buffered gz line reader (strips trailing \r\n)
    gzFile f;
    uint8_t buf[1 << 16];
    int len = 0, pos = 0;
    bool eof = false;

    explicit Line(gzFile file) : f(file) {}

    // returns length of line, -1 on EOF; line bytes appended to `out`
    int64_t next(Pool &out) {
        uint64_t start = out.size;
        for (;;) {
            if (pos >= len) {
                if (eof) return out.size > start ? (int64_t)(out.size - start) : -1;
                len = gzread(f, buf, sizeof(buf));
                pos = 0;
                if (len <= 0) {
                    eof = true;
                    len = 0;
                    continue;
                }
            }
            uint8_t *nl = static_cast<uint8_t *>(memchr(buf + pos, '\n', len - pos));
            if (nl) {
                uint64_t n = nl - (buf + pos);
                if (!out.push(buf + pos, n)) return -2;
                pos += n + 1;
                // strip \r
                if (out.size > start && out.data[out.size - 1] == '\r') out.size--;
                return (int64_t)(out.size - start);
            }
            if (!out.push(buf + pos, len - pos)) return -2;
            pos = len;
        }
    }
};

}  // namespace

extern "C" {

struct StbrReads {
    uint8_t *seq;        // concatenated sequence bytes (ASCII)
    uint64_t *seq_off;   // n_reads + 1 offsets into seq
    uint8_t *names;      // concatenated name bytes
    uint64_t *name_off;  // n_reads + 1 offsets into names
    uint64_t n_reads;
    int32_t error;       // 0 ok, 1 open failed, 2 oom, 3 parse error
};

StbrReads *stbr_read_fastx(const char *path) {
    auto *r = static_cast<StbrReads *>(calloc(1, sizeof(StbrReads)));
    if (!r) return nullptr;
    gzFile f = gzopen(path, "rb");
    if (!f) {
        r->error = 1;
        return r;
    }
    gzbuffer(f, 1 << 20);
    Pool seq, names, scratch;
    U64Vec soff, noff;
    soff.push(0);
    noff.push(0);
    Line rd(f);
    bool ok = true;
    for (;;) {
        scratch.size = 0;
        int64_t n = rd.next(scratch);
        if (n == -1) break;
        if (n == -2 || scratch.size == 0) { ok = (n != -2); if (n == -2) r->error = 2; break; }
        uint8_t tag = scratch.data[0];
        if (tag == '>') {
            if (!names.push(scratch.data + 1, scratch.size - 1)) { r->error = 2; ok = false; break; }
            noff.push(names.size);
            // sequence may span multiple lines until next '>' or EOF
            for (;;) {
                scratch.size = 0;
                // peek: read a line; if it starts with '>', we must not consume
                // it — emulate pushback by checking the first byte after read.
                int64_t m = rd.next(scratch);
                if (m <= 0) break;
                if (scratch.data[0] == '>') {
                    // next record header: handle inline (no pushback needed)
                    soff.push(seq.size);
                    if (!names.push(scratch.data + 1, scratch.size - 1)) { r->error = 2; ok = false; break; }
                    noff.push(names.size);
                    scratch.size = 0;
                    continue;
                }
                if (!seq.push(scratch.data, scratch.size)) { r->error = 2; ok = false; break; }
            }
            if (!ok) break;
            soff.push(seq.size);
            break;  // EOF reached inside the FASTA loop
        } else if (tag == '@') {
            if (!names.push(scratch.data + 1, scratch.size - 1)) { r->error = 2; ok = false; break; }
            noff.push(names.size);
            scratch.size = 0;
            if (rd.next(scratch) < 0 || !seq.push(scratch.data, scratch.size)) { r->error = 3; ok = false; break; }
            soff.push(seq.size);
            scratch.size = 0;
            if (rd.next(scratch) < 0 || scratch.size == 0 || scratch.data[0] != '+') { r->error = 3; ok = false; break; }
            scratch.size = 0;
            if (rd.next(scratch) < 0) { r->error = 3; ok = false; break; }  // quality line (dropped)
        } else {
            r->error = 3;
            ok = false;
            break;
        }
    }
    gzclose(f);
    if (ok) {
        r->seq = seq.data;
        r->seq_off = soff.data;
        r->names = names.data;
        r->name_off = noff.data;
        r->n_reads = soff.size - 1;
    } else {
        free(seq.data);
        free(names.data);
        free(soff.data);
        free(noff.data);
    }
    return r;
}

void stbr_free_reads(StbrReads *r) {
    if (!r) return;
    free(r->seq);
    free(r->seq_off);
    free(r->names);
    free(r->name_off);
    free(r);
}

}  // extern "C"
