// Node.js binding for tachyon_tpu (see src/addon.c; byte layouts in
// tachyon_tpu/c/api.h).  Build: `make -C ../c && npm install`.
"use strict";
module.exports = require("./build/Release/tachyon_tpu.node");
