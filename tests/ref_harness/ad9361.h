/* Stub libad9361 surface (test scaffolding). */
#ifndef STUB_AD9361_H
#define STUB_AD9361_H

struct iio_device;
int ad9361_set_bb_rate(struct iio_device *dev, unsigned long rate);

#endif
