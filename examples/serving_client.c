/* Minimal C client for the stofnet_tpu serving daemon.
 *
 * The wire protocol (stofnet_tpu/serving/tcp.py) is a deliberately
 * boring length-prefixed binary format so ANY language speaks it
 * without a codegen step — this file is the proof. No dependencies
 * beyond POSIX sockets.
 *
 *   request  : "SFN1" + uint32 k + uint32 L (LE) + k*L float32 (LE)
 *   compact  : "SFN2" + uint8 wire + uint8 0 + uint32 k + uint32 L (LE)
 *              wire 1 (bf16): k*L uint16 — the round-to-nearest-even top
 *                16 bits of each float32 (HALF the request bytes;
 *                lossless for a bf16-forward artifact)
 *              wire 2 (int8): per waveform, float32 scale then L int8
 *                with value = scale*q, scale = max|row|/127 (a QUARTER
 *                of the bytes; measured 0.974 — documented experiment)
 *              wire 3 (s16) : per waveform, float32 scale then L int16
 *                (scale = max|row|/32767; half the bytes, >=0.99)
 *   response : int32 status + uint32 m (LE) — always float32 coords
 *              status 0: m = E coords per waveform, then k*E float32
 *              status 1: m = UTF-8 error message byte length, then it
 *              status 2: m = UTF-8 JSON byte length, then it (stats)
 *   stats    : "SFNS" (no further header) -> status-2 response
 *
 * Build:  gcc -O2 -o serving_client examples/serving_client.c -lm
 * Run  :  ./serving_client HOST PORT L [f32|bf16|int8|s16] < waveform.f32
 *         (reads L little-endian float32 samples from stdin, prints the
 *         decoded coords one per line, then the daemon's live stats;
 *         the optional 4th arg picks the request wire, default f32)
 */
#include <arpa/inet.h>
#include <math.h>
#include <netdb.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <unistd.h>

static int read_exact(int fd, void *buf, size_t n) {
    char *p = (char *)buf;
    while (n) {
        ssize_t r = read(fd, p, n);
        if (r <= 0) return -1;
        p += r;
        n -= (size_t)r;
    }
    return 0;
}

static int write_exact(int fd, const void *buf, size_t n) {
    const char *p = (const char *)buf;
    while (n) {
        ssize_t w = write(fd, p, n);
        if (w <= 0) return -1;
        p += w;
        n -= (size_t)w;
    }
    return 0;
}

/* read a response header; on status 1 print the error and exit */
static uint32_t read_response(int fd, int expect_status) {
    int32_t status;
    uint32_t m;
    if (read_exact(fd, &status, 4) || read_exact(fd, &m, 4)) {
        fprintf(stderr, "connection closed mid-response\n");
        exit(1);
    }
    if (status == 1) { /* in-band error (e.g. Overloaded, bad length) */
        char *msg = malloc(m + 1);
        if (!msg || read_exact(fd, msg, m)) exit(1);
        msg[m] = 0;
        fprintf(stderr, "server error: %s\n", msg);
        exit(2);
    }
    if (status != expect_status) {
        fprintf(stderr, "unexpected status %d\n", status);
        exit(1);
    }
    return m;
}

/* float32 -> bfloat16: round-to-nearest-even truncation to the top 16
 * bits — the exact rounding an XLA f32->bf16 cast performs */
static uint16_t f32_to_bf16(float f) {
    uint32_t u;
    memcpy(&u, &f, 4);
    return (uint16_t)((u + 0x7fffu + ((u >> 16) & 1u)) >> 16);
}

int main(int argc, char **argv) {
    if (argc != 4 && argc != 5) {
        fprintf(stderr,
                "usage: %s HOST PORT L [f32|bf16|int8|s16]  (< L f32 samples)\n",
                argv[0]);
        return 1;
    }
    uint32_t L = (uint32_t)strtoul(argv[3], NULL, 10);
    uint8_t wire = 0; /* 0 f32, 1 bf16, 2 int8, 3 s16 */
    if (argc == 5) {
        if (!strcmp(argv[4], "bf16")) wire = 1;
        else if (!strcmp(argv[4], "int8")) wire = 2;
        else if (!strcmp(argv[4], "s16")) wire = 3;
        else if (strcmp(argv[4], "f32")) {
            fprintf(stderr, "unknown wire %s\n", argv[4]);
            return 1;
        }
    }

    struct addrinfo hints = {0}, *ai;
    hints.ai_socktype = SOCK_STREAM;
    if (getaddrinfo(argv[1], argv[2], &hints, &ai)) {
        perror("getaddrinfo");
        return 1;
    }
    int fd = socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
    if (fd < 0 || connect(fd, ai->ai_addr, ai->ai_addrlen)) {
        perror("connect");
        return 1;
    }
    freeaddrinfo(ai);

    float *wave = malloc(4ull * L);
    if (!wave || fread(wave, 4, L, stdin) != L) {
        fprintf(stderr, "expected %u float32 samples on stdin\n", L);
        return 1;
    }

    /* ---- inference round trip (k=1 waveform) ---- */
    uint32_t hdr[2] = {1u, L}; /* little-endian host assumed (x86/arm) */
    int send_err;
    if (wire == 0) {
        send_err = write_exact(fd, "SFN1", 4) || write_exact(fd, hdr, 8) ||
                   write_exact(fd, wave, 4ull * L);
    } else {
        uint8_t hdr2[10] = {wire, 0};
        memcpy(hdr2 + 2, hdr, 8);
        send_err = write_exact(fd, "SFN2", 4) || write_exact(fd, hdr2, 10);
        if (!send_err && wire == 1) { /* bf16: top 16 bits, RNE */
            uint16_t *h = malloc(2ull * L);
            for (uint32_t i = 0; i < L; i++) h[i] = f32_to_bf16(wave[i]);
            send_err = write_exact(fd, h, 2ull * L);
            free(h);
        } else if (!send_err) { /* int8/s16: f32 scale + L codes per row */
            float amax = 0.f;
            for (uint32_t i = 0; i < L; i++) {
                float a = wave[i] < 0 ? -wave[i] : wave[i];
                if (a > amax) amax = a;
            }
            float top = wire == 2 ? 127.f : 32767.f;
            float scale = amax > 0.f ? amax / top : 1.f;
            send_err = write_exact(fd, &scale, 4);
            if (!send_err && wire == 2) {
                int8_t *q = malloc(L);
                for (uint32_t i = 0; i < L; i++) {
                    float v = wave[i] / scale;
                    v = v < -top ? -top : (v > top ? top : v);
                    /* round half to even like rint() under default mode */
                    q[i] = (int8_t)lrintf(v);
                }
                send_err = write_exact(fd, q, L);
                free(q);
            } else if (!send_err) { /* s16: the >=0.99 compact wire */
                int16_t *q = malloc(2ull * L);
                for (uint32_t i = 0; i < L; i++) {
                    float v = wave[i] / scale;
                    v = v < -top ? -top : (v > top ? top : v);
                    q[i] = (int16_t)lrintf(v);
                }
                send_err = write_exact(fd, q, 2ull * L);
                free(q);
            }
        }
    }
    if (send_err) {
        perror("send");
        return 1;
    }
    uint32_t E = read_response(fd, 0);
    float *coords = malloc(4ull * E);
    if (!coords || read_exact(fd, coords, 4ull * E)) return 1;
    for (uint32_t i = 0; i < E; i++) printf("%g\n", coords[i]);

    /* ---- live stats on the same connection ---- */
    if (write_exact(fd, "SFNS", 4)) return 1;
    uint32_t m = read_response(fd, 2);
    char *json = malloc(m + 1);
    if (!json || read_exact(fd, json, m)) return 1;
    json[m] = 0;
    fprintf(stderr, "stats: %s\n", json);

    close(fd);
    free(wave);
    free(coords);
    free(json);
    return 0;
}
