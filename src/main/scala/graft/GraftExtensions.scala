package graft

import graft.functions.{ArrDot, ArrDotL, ArrL2Sq, CharNgrams, FnvHash64, JsonTagsMap, LshBandKeys, LshBandKeysLin, MinHashSig, PackBlob, SimHash48, UnpackBlob, WinnowFps}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** SparkSessionExtensions entry point: registers graft's native
  * expressions into the session's function registry.
  *
  * Two ways in:
  *  - config: `spark.sql.extensions=graft.GraftExtensions` (new sessions)
  *  - programmatic: `GraftExtensions.register(spark)` (existing sessions
  *    — what the query pack uses, idempotent)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("fnv_hash64"), FnvHash64.info, exprs => FnvHash64(exprs.head)))
    ext.injectFunction(
      (FunctionIdentifier("simhash48"), SimHash48.info, exprs => SimHash48(exprs.head)))
    ext.injectFunction(
      (FunctionIdentifier("minhash_sig"), MinHashSig.info,
        exprs => MinHashSig(exprs(0), exprs(1))))
    ext.injectFunction(
      (FunctionIdentifier("json_tags_map"), JsonTagsMap.info, exprs => JsonTagsMap(exprs.head)))
    ext.injectFunction(
      (FunctionIdentifier("lsh_band_keys"), LshBandKeys.info,
        exprs => LshBandKeys(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction(
      (FunctionIdentifier("lsh_band_keys_lin"), LshBandKeysLin.info,
        exprs => LshBandKeysLin(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction(
      (FunctionIdentifier("arr_dot"), ArrDot.info, exprs => ArrDot(exprs(0), exprs(1))))
    ext.injectFunction(
      (FunctionIdentifier("arr_l2sq"), ArrL2Sq.info, exprs => ArrL2Sq(exprs(0), exprs(1))))
    ext.injectFunction(
      (FunctionIdentifier("arr_dotl"), ArrDotL.info, exprs => ArrDotL(exprs(0), exprs(1))))
    ext.injectFunction(
      (FunctionIdentifier("pack_blob"), PackBlob.info,
        exprs => PackBlob(exprs(0), exprs(1))))
    ext.injectFunction(
      (FunctionIdentifier("unpack_blob"), UnpackBlob.info, exprs => UnpackBlob(exprs.head)))
    ext.injectFunction(
      (FunctionIdentifier("winnow_fps"), WinnowFps.info,
        exprs => WinnowFps(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction(
      (FunctionIdentifier("char_ngrams"), CharNgrams.info,
        exprs => CharNgrams(exprs(0), exprs(1))))
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("fnv_hash64"), FnvHash64.info, exprs => FnvHash64(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash48"), SimHash48.info, exprs => SimHash48(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"), MinHashSig.info,
      exprs => MinHashSig(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("json_tags_map"), JsonTagsMap.info, exprs => JsonTagsMap(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lsh_band_keys"), LshBandKeys.info,
      exprs => LshBandKeys(exprs(0), exprs(1), exprs(2)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lsh_band_keys_lin"), LshBandKeysLin.info,
      exprs => LshBandKeysLin(exprs(0), exprs(1), exprs(2)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("arr_dot"), ArrDot.info, exprs => ArrDot(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("arr_l2sq"), ArrL2Sq.info, exprs => ArrL2Sq(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("arr_dotl"), ArrDotL.info, exprs => ArrDotL(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pack_blob"), PackBlob.info,
      exprs => PackBlob(exprs(0), exprs(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("unpack_blob"), UnpackBlob.info, exprs => UnpackBlob(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("winnow_fps"), WinnowFps.info,
      exprs => WinnowFps(exprs(0), exprs(1), exprs(2)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("char_ngrams"), CharNgrams.info,
      exprs => CharNgrams(exprs(0), exprs(1)))
  }
}
