/* Stub implementations turning the unmodified reference simulator into a
 * file-writing golden-IQ oracle (test scaffolding, not framework code).
 *
 * iio_buffer_push() appends the staged int16 IQ buffer to the file named
 * by $REF_CAPTURE_FILE, sleeps $REF_PUSH_SLEEP_MS (default 100 ms, i.e.
 * hardware pacing so the producer thread always refills between pushes),
 * and returns -1 after $REF_CAPTURE_BUFFERS pushes, which makes the
 * reference's TX thread shut the whole program down cleanly.
 *
 * The capture may contain leading all-zero buffers and (on scheduling
 * hiccups) exact duplicate consecutive buffers — the Python side strips
 * both (the composite GPS signal never repeats a 0.1 s block exactly).
 */
#define _GNU_SOURCE
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <unistd.h>

#include "iio.h"
#include "ad9361.h"
#include "curl/curl.h"

struct iio_buffer {
    char *data;
    size_t nbytes;
    long pushes;
    long max_pushes;
    long sleep_ms;
    FILE *out;
};

static struct iio_context *FAKE_CTX = (struct iio_context *) 0x1;
static struct iio_device *FAKE_DEV = (struct iio_device *) 0x2;
static struct iio_channel *FAKE_CHN = (struct iio_channel *) 0x3;

struct iio_context *iio_create_default_context(void) { return FAKE_CTX; }
struct iio_context *iio_create_network_context(const char *h) { (void) h; return FAKE_CTX; }
struct iio_context *iio_create_context_from_uri(const char *u) { (void) u; return FAKE_CTX; }
void iio_context_destroy(struct iio_context *ctx) { (void) ctx; }
unsigned int iio_context_get_devices_count(const struct iio_context *ctx) { (void) ctx; return 2; }
struct iio_device *iio_context_find_device(const struct iio_context *ctx, const char *name) {
    (void) ctx; (void) name; return FAKE_DEV;
}
int iio_device_set_kernel_buffers_count(const struct iio_device *d, unsigned int n) {
    (void) d; (void) n; return 0;
}
struct iio_channel *iio_device_find_channel(const struct iio_device *d, const char *n, bool o) {
    (void) d; (void) n; (void) o; return FAKE_CHN;
}
ssize_t iio_channel_attr_write(const struct iio_channel *c, const char *a, const char *v) {
    (void) c; (void) a; (void) v; return 0;
}
int iio_channel_attr_write_longlong(const struct iio_channel *c, const char *a, long long v) {
    (void) c; (void) a; (void) v; return 0;
}
int iio_channel_attr_write_double(const struct iio_channel *c, const char *a, double v) {
    (void) c; (void) a; (void) v; return 0;
}
int iio_channel_attr_write_bool(const struct iio_channel *c, const char *a, bool v) {
    (void) c; (void) a; (void) v; return 0;
}
void iio_channel_enable(struct iio_channel *c) { (void) c; }
void iio_channel_disable(struct iio_channel *c) { (void) c; }

struct iio_buffer *iio_device_create_buffer(const struct iio_device *dev,
                                            size_t samples_count, bool cyclic) {
    (void) dev; (void) cyclic;
    struct iio_buffer *b = calloc(1, sizeof(*b));
    b->nbytes = samples_count * 2 * sizeof(short);
    b->data = calloc(1, b->nbytes);

    const char *path = getenv("REF_CAPTURE_FILE");
    b->out = fopen(path ? path : "ref_capture.bin", "wb");

    const char *nbuf = getenv("REF_CAPTURE_BUFFERS");
    b->max_pushes = nbuf ? atol(nbuf) : 10;

    const char *slp = getenv("REF_PUSH_SLEEP_MS");
    b->sleep_ms = slp ? atol(slp) : 100;
    return b;
}

void iio_buffer_destroy(struct iio_buffer *b) {
    if (!b) return;
    if (b->out) fclose(b->out);
    free(b->data);
    free(b);
}

void *iio_buffer_start(const struct iio_buffer *b) { return b->data; }

ssize_t iio_buffer_push(struct iio_buffer *b) {
    if (b->pushes >= b->max_pushes)
        return -1;
    fwrite(b->data, 1, b->nbytes, b->out);
    fflush(b->out);
    b->pushes++;
    if (b->sleep_ms > 0) {
        struct timespec ts = {b->sleep_ms / 1000,
                              (b->sleep_ms % 1000) * 1000000L};
        nanosleep(&ts, NULL);
    }
    return (ssize_t) b->nbytes;
}

void iio_strerror(int err, char *dst, size_t len) {
    snprintf(dst, len, "stub iio error %d", err);
}

int ad9361_set_bb_rate(struct iio_device *dev, unsigned long rate) {
    (void) dev; (void) rate; return 0;
}

/* never exercised: the oracle harness does not use -f */
CURLcode curl_global_init(long f) { (void) f; return CURLE_OK; }
CURL *curl_easy_init(void) { return NULL; }
CURLcode curl_easy_setopt(CURL *h, CURLoption o, ...) { (void) h; (void) o; return CURLE_OK; }
CURLcode curl_easy_perform(CURL *h) { (void) h; return CURLE_GOT_NOTHING; }
void curl_easy_cleanup(CURL *h) { (void) h; }
void curl_global_cleanup(void) { }
