package graft.enrich

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Wikidata entity-JSON parser: one dump document → a flat sequence of
  * snak rows (reference `wikidata/model.py:19-238` — Item / Claim /
  * Snak / SiteLink).
  *
  * The reference materializes an object graph per item and resolves
  * entity references with per-QID client fetches. The Spark design
  * flattens every snak — main snaks, qualifiers, reference snaks,
  * labels, aliases, descriptions, sitelinks — into ONE uniform row
  * shape, so that the whole downstream transform (value conversion,
  * label resolution, qualifier aggregation, property mapping) is
  * relational: label lookup becomes a join over the dump itself instead
  * of a point lookup per claim. This is the 100 TB shape — the parse is
  * a map-only pass and everything after it is key-partitioned.
  */
object WikidataModel {

  /** One snak-ish row of a parsed item.
    *
    * `role`: `main` (claim mainsnak), `qual` (claim qualifier), `ref`
    * (reference snak), `label`, `alias`, `desc`, `sitelink`.
    * For `qual`/`ref` rows, `prop` is the qualifier/reference property
    * and `claimProp` the owning claim's property; `claimId` links them.
    * Value fields mirror the wikidata datavalue union
    * (`wikidata/value.py:27-92`): exactly one family is populated
    * according to `valueType`.
    */
  final case class SnakRow(
      qid: String,
      modified: Option[String],
      role: String,
      prop: Option[String],
      claimId: Option[String],
      claimProp: Option[String],
      rank: Option[String],
      snaktype: Option[String],
      valueType: Option[String],
      vString: Option[String],
      vTime: Option[String],
      vPrecision: Option[Int],
      vEntity: Option[String],
      vMonoText: Option[String],
      vMonoLang: Option[String],
      vAmount: Option[String],
      vUnit: Option[String],
      lang: Option[String],
      site: Option[String],
      title: Option[String])

  private lazy val mapper = new ObjectMapper()

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText)
      .filter(_.nonEmpty)

  private def emptyRow(qid: String, modified: Option[String], role: String) =
    SnakRow(qid, modified, role, None, None, None, None, None, None,
      None, None, None, None, None, None, None, None, None, None, None)

  /** Decode one snak's datavalue into the value-union fields
    * (`wikidata/model.py:22-31` pops `datavalue.type` / `.value`).
    */
  private def snakFields(row: SnakRow, snak: JsonNode): SnakRow = {
    val snaktype = optText(snak, "snaktype")
    val prop = optText(snak, "property")
    val dv = Option(snak.get("datavalue")).filterNot(_.isNull)
    val valueType = dv.flatMap(optText(_, "type"))
    val value = dv.flatMap(d => Option(d.get("value")).filterNot(_.isNull))
    var r = row.copy(prop = prop.orElse(row.prop), snaktype = snaktype,
      valueType = valueType)
    value.foreach { v =>
      valueType.getOrElse("") match {
        case "time" =>
          r = r.copy(vTime = optText(v, "time"),
            vPrecision = Option(v.get("precision")).filterNot(_.isNull)
              .map(_.asInt))
        case "wikibase-entityid" =>
          r = r.copy(vEntity = optText(v, "id"))
        case "monolingualtext" =>
          r = r.copy(vMonoText = optText(v, "text"),
            vMonoLang = optText(v, "language"))
        case "quantity" =>
          r = r.copy(vAmount = optText(v, "amount"),
            vUnit = optText(v, "unit"))
        case _ =>
          if (v.isTextual) r = r.copy(vString = Some(v.asText))
      }
    }
    r
  }

  /** Parse one wikidata entity-JSON document. Returns Nil on malformed
    * input (the dump reader's PERMISSIVE mode). Redirected items take
    * the redirect target as their id (`wikidata/model.py:164-168`).
    */
  def parseItem(doc: String): Seq[SnakRow] = {
    val root =
      try mapper.readTree(doc)
      catch { case _: Exception => return Nil }
    if (root == null || !root.isObject) return Nil
    val rawId = optText(root, "id").getOrElse(return Nil)
    val qid = Option(root.get("redirects")).filterNot(_.isNull)
      .flatMap(optText(_, "to")).getOrElse(rawId)
    val modified = optText(root, "modified")
    val out = Seq.newBuilder[SnakRow]
    val base = emptyRow(qid, modified, "")

    def langValues(field: String, role: String): Unit = {
      Option(root.get(field)).filterNot(_.isNull).foreach { node =>
        node.properties().asScala.foreach { e =>
          val objs =
            if (e.getValue.isArray) e.getValue.elements().asScala.toSeq
            else Seq(e.getValue)
          objs.foreach { o =>
            for (v <- optText(o, "value"); l <- optText(o, "language"))
              out += base.copy(role = role, vString = Some(v),
                lang = Some(l))
          }
        }
      }
    }
    langValues("labels", "label")
    langValues("aliases", "alias")
    langValues("descriptions", "desc")

    Option(root.get("claims")).filterNot(_.isNull).foreach { claims =>
      claims.properties().asScala.foreach { e =>
        val claimProp = e.getKey
        e.getValue.elements().asScala.foreach { c =>
          val claimId = optText(c, "id")
          val rank = optText(c, "rank")
          Option(c.get("mainsnak")).filterNot(_.isNull).foreach { ms =>
            out += snakFields(
              base.copy(role = "main", prop = Some(claimProp),
                claimId = claimId, claimProp = Some(claimProp),
                rank = rank), ms)
          }
          Option(c.get("qualifiers")).filterNot(_.isNull).foreach { qs =>
            qs.properties().asScala.foreach { q =>
              q.getValue.elements().asScala.foreach { s =>
                out += snakFields(
                  base.copy(role = "qual", prop = Some(q.getKey),
                    claimId = claimId, claimProp = Some(claimProp),
                    rank = rank), s)
              }
            }
          }
          Option(c.get("references")).filterNot(_.isNull).foreach { rs =>
            rs.elements().asScala.foreach { ref =>
              Option(ref.get("snaks")).filterNot(_.isNull).foreach { sn =>
                sn.properties().asScala.foreach { p =>
                  p.getValue.elements().asScala.foreach { s =>
                    out += snakFields(
                      base.copy(role = "ref", prop = Some(p.getKey),
                        claimId = claimId, claimProp = Some(claimProp),
                        rank = rank), s)
                  }
                }
              }
            }
          }
        }
      }
    }

    Option(root.get("sitelinks")).filterNot(_.isNull).foreach { sl =>
      sl.properties().asScala.foreach { e =>
        val site = optText(e.getValue, "site")
        val title = optText(e.getValue, "title")
        val url = optText(e.getValue, "url")
        out += base.copy(role = "sitelink", site = site, title = title,
          vString = url)
      }
    }
    out.result()
  }
}
